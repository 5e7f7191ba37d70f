"""MXU-routed BatchNorm batch statistics (TPU hot path, round-2).

Round-1 profiling localized ~15.1 ms of the 41.7 ms flagship train step to
BatchNorm batch-stat reductions (XLA convert+reduce chains running ~16x off
the HBM roofline). Round 2 first tried Pallas single-pass kernels
(ops/pallas_bn.py): the kernels themselves run in 5.3 ms, but `pallas_call`
is a fusion barrier — XLA re-materialized the surrounding BN-normalize /
ReLU / pool-mask elementwise work and inserted ~7 ms of layout copies around
the 48 kernel calls, a NET REGRESSION (61.3 vs 48.5 ms/step measured A/B).

This module keeps everything inside XLA instead and routes the reductions
onto the MXU, where a reduction is a matmul (the scaling-book trick):

- ``sum(x)``        = ``ones(M) @ X``            for ``X: (M, C)``
- ``sum(x * x)``    = ``diag(X^T @ X)``           (Gram matrix; the off-
  diagonal FLOPs are free on the systolic array — the op streams X once at
  full HBM bandwidth with f32 accumulation)
- backward: ``sum(dy)`` = ``ones @ dY`` and ``sum(dy * xhat)`` derived from
  ``diag(dY^T @ X)`` via ``(sum(dy*x) - mean*sum(dy)) * rstd``.

No pallas_call, no custom layouts: XLA fuses the bf16->f32 converts into the
dot operands and keeps the elementwise normalize fused with its neighbors
exactly as in stock flax mode.

Numerics: bf16 x bf16 products are EXACT in float32 (8-bit mantissas), and
the MXU accumulates in float32, so ``sum(x^2)`` here is at least as accurate
as flax's convert-to-f32-then-reduce. ``var = max(0, E[x^2] - E[x]^2)``
(fast-variance), f32 normalize arithmetic cast to the module dtype —
flax.linen.BatchNorm-compatible (tolerance-level parity asserted in tests).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Contract over the row axis of (M, C) operands; f32 accumulation.
_ROW_CONTRACT = (((0,), (0,)), ((), ()))


def _precision_for(dtype) -> lax.Precision:
    # bf16 x bf16 products are exact in f32, so default MXU precision is
    # already lossless there. float32 operands would be TRUNCATED to bf16 by
    # the default TPU matmul precision — these dots carry activation data, so
    # force HIGHEST (CLAUDE.md kernel rule) at f32; costs the multi-pass
    # emulation only in the f32 configuration.
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def _row_sum(x2d: jnp.ndarray) -> jnp.ndarray:
    """Per-channel sum via ``ones(M) @ X`` on the MXU -> (C,) float32."""
    ones = jnp.ones((x2d.shape[0],), x2d.dtype)
    return lax.dot_general(ones, x2d, (((0,), (0,)), ((), ())),
                           precision=_precision_for(x2d.dtype),
                           preferred_element_type=jnp.float32)


def _row_dot(a2d: jnp.ndarray, b2d: jnp.ndarray) -> jnp.ndarray:
    """Per-channel ``sum(a * b)`` as the diagonal of ``A^T @ B`` -> (C,) f32.

    The full (C, C) product is computed; on the MXU that costs the same
    single streaming pass over A and B as a plain reduction would. The
    (C, C) f32 OUTPUT is an O(C^2) transient, though: negligible for conv
    channels (C <= 1024 -> <= 4 MB) but ~98 MB for the 4960-unit dense-head
    BatchNorm. Acceptable only because this mode is a kept-for-the-record
    negative result (55.9 vs 48.5 ms/step stock — XLA canonicalizes these
    dots back into reduces anyway, see the module docstring); tile C in
    blocks here before ever promoting the mode to a default.
    """
    gram = lax.dot_general(a2d, b2d, _ROW_CONTRACT,
                           precision=_precision_for(a2d.dtype),
                           preferred_element_type=jnp.float32)
    return jnp.diagonal(gram)


def mxu_batch_stats(x: jnp.ndarray):
    """Per-channel (mean, var) over all leading axes of ``x`` (..., C)."""
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    x2d = x.reshape(m, c)
    mean = _row_sum(x2d) / m
    ex2 = _row_dot(x2d, x2d) / m
    var = jnp.maximum(0.0, ex2 - mean * mean)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mxu_bn_train(x, scale, bias, eps, out_dtype):
    """Training-mode BatchNorm: returns (y, mean, var).

    mean/var (float32, for the running-average update) are
    non-differentiable outputs — their cotangents are ignored, exact for the
    standard use where they only feed stop-gradient running stats.
    """
    return _fwd_impl(x, scale, bias, eps, out_dtype)[0]


def _fwd_impl(x, scale, bias, eps, out_dtype):
    mean, var = mxu_batch_stats(x)
    rstd = lax.rsqrt(var + eps)
    mul = rstd * scale.astype(jnp.float32)
    y = ((x.astype(jnp.float32) - mean) * mul
         + bias.astype(jnp.float32)).astype(out_dtype)
    return (y, mean, var), (x, scale, mean, rstd)


def _mxu_bn_fwd(x, scale, bias, eps, out_dtype):
    return _fwd_impl(x, scale, bias, eps, out_dtype)


def _mxu_bn_bwd(eps, out_dtype, residuals, cotangents):
    x, scale, mean, rstd = residuals
    dy = cotangents[0]  # d(mean)/d(var) cotangents are zero by contract
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    dy2d = dy.reshape(m, c)
    x2d = x.reshape(m, c)
    s1 = _row_sum(dy2d)                       # sum(dy)
    sxy = _row_dot(dy2d, x2d)                 # sum(dy * x)
    s2 = (sxy - mean * s1) * rstd             # sum(dy * xhat)
    coef = scale.astype(jnp.float32) * rstd
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = (coef * (dy.astype(jnp.float32) - s1 / m - xhat * (s2 / m))).astype(
        x.dtype)
    return dx, s2.astype(scale.dtype), s1.astype(scale.dtype)


mxu_bn_train.defvjp(_mxu_bn_fwd, _mxu_bn_bwd)
