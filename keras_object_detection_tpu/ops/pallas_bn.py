"""Pallas fused BatchNorm batch-statistics kernels (TPU hot path).

Round-1 profiling localized 15.1 ms of the 41.7 ms train step to BatchNorm
batch-stat reductions running ~16x off the HBM bandwidth roofline (unfused
convert+reduce chains; see ROADMAP.md). These kernels replace them with
single-pass accumulations:

- forward: per-channel ``sum(x)`` / ``sum(x^2)`` in one read of ``x``
  (float32 accumulation from bfloat16 input, matching flax's
  force_float32_reductions semantics),
- backward: per-channel ``sum(dy)`` / ``sum(dy * xhat)`` in one read of
  ``dy`` and ``x``.

The elementwise normalize / dx parts stay in jnp where XLA fuses them with
the surrounding conv/ReLU.

Numerics mirror ``flax.linen.BatchNorm`` (use_fast_variance=True,
force_float32_reductions=True): stats in float32, ``var = max(0, E[x^2] -
E[x]^2)``, normalize arithmetic in float32, output cast to the module dtype.
Parity (value + grad vs flax autodiff) is asserted in tests/test_pallas_bn.py.

Layout note: inputs are viewed as (M, C) by collapsing the leading axes —
a layout-preserving (free) reshape. A lane-filling fold to (M/F, F*C) for
C < 128 was tried and REJECTED: TPU arrays are lane-tiled, so that reshape is
a full relayout copy of the activation in HBM, which costs more than the
half-empty lanes it saves (measured: 206 MB C=64 stats pass ran at an
apparent 204 GB/s including the hidden copy).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Target bytes per input block. Scoped-VMEM budget per block is roughly
# rows x max(C,128-lane-padded) x (2 dtypes double-buffered + ~4 f32 temps)
# ~= 12 B/row-lane in the backward kernel, so 2048-row blocks at C<=128 stay
# ~3-6 MB, well under the 16 MB limit (8192-row blocks OOM'd: 19.82M).
_TARGET_BLOCK_BYTES = 1 << 19
_MIN_BLOCK_ROWS = 256
_MAX_BLOCK_ROWS = 2048


def _block_rows(width: int, itemsize: int, m: int) -> int:
    rows = _TARGET_BLOCK_BYTES // max(1, width * itemsize)
    pow2 = 1 << max(0, int(rows).bit_length() - 1)
    pow2 = max(_MIN_BLOCK_ROWS, min(_MAX_BLOCK_ROWS, pow2))
    if m <= pow2:
        # single block: round rows up to a full sublane so the block spec
        # stays tile-aligned
        return ((m + 7) // 8) * 8
    return pow2


def _row_mask(shape, program, block_rows, rows_total):
    rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (rid + program * block_rows) < rows_total


def _stats_kernel(x_ref, out_ref, *, block_rows, rows_total):
    i = pl.program_id(0)
    xf = x_ref[:].astype(jnp.float32)
    # Out-of-bounds block rows are undefined memory; select (not multiply)
    # so NaN/inf garbage cannot leak into the sums.
    xf = jnp.where(_row_mask(xf.shape, i, block_rows, rows_total), xf, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += jnp.sum(xf, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _grad_stats_kernel(dy_ref, x_ref, mean_ref, rstd_ref, out_ref, *,
                       block_rows, rows_total):
    i = pl.program_id(0)
    valid = _row_mask(dy_ref.shape, i, block_rows, rows_total)
    dyf = jnp.where(valid, dy_ref[:].astype(jnp.float32), 0.0)
    xhat = (x_ref[:].astype(jnp.float32) - mean_ref[:]) * rstd_ref[:]
    prod = jnp.where(valid, dyf * xhat, 0.0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0:1, :] += jnp.sum(dyf, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(prod, axis=0, keepdims=True)


def bn_batch_stats(x: jnp.ndarray, interpret: bool = False):
    """Per-channel (mean, var) over all leading axes of ``x`` (..., C).

    float32 accumulation in a single pass over ``x``;
    ``var = max(0, E[x^2] - E[x]^2)`` (flax fast-variance semantics).
    """
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    x2d = x.reshape(m, c)
    block = _block_rows(c, x2d.dtype.itemsize, m)
    out = pl.pallas_call(
        functools.partial(_stats_kernel, block_rows=block, rows_total=m),
        grid=(pl.cdiv(m, block),),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(x2d)
    mean = out[0] / m
    var = jnp.maximum(0.0, out[1] / m - mean * mean)
    return mean, var


def bn_grad_stats(dy: jnp.ndarray, x: jnp.ndarray, mean: jnp.ndarray,
                  rstd: jnp.ndarray, interpret: bool = False):
    """Per-channel (sum(dy), sum(dy * xhat)) with xhat = (x - mean) * rstd.

    One pass over ``dy`` and ``x``; these are the only reductions in the
    BatchNorm backward (dbias / dscale, and the per-channel terms of dx).
    """
    c = x.shape[-1]
    m = int(np.prod(x.shape[:-1]))
    dy2d = dy.reshape(m, c)
    x2d = x.reshape(m, c)
    mean_row = mean.astype(jnp.float32).reshape(1, c)
    rstd_row = rstd.astype(jnp.float32).reshape(1, c)
    block = _block_rows(c, x2d.dtype.itemsize, m)
    out = pl.pallas_call(
        functools.partial(_grad_stats_kernel, block_rows=block, rows_total=m),
        grid=(pl.cdiv(m, block),),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=interpret,
    )(dy2d, x2d, mean_row, rstd_row)
    return out[0], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_bn_train(x, scale, bias, eps, out_dtype, interpret=False):
    """Training-mode BatchNorm: returns (y, mean, var).

    Matches flax BatchNorm numerics: float32 stats/arithmetic, output cast to
    ``out_dtype``. ``mean``/``var`` (float32, for the running-average update)
    are non-differentiable outputs — their cotangents are ignored, which is
    exact for the standard use where they only feed stop-gradient state.
    """
    return _fwd_impl(x, scale, bias, eps, out_dtype, interpret)[0]


def _fwd_impl(x, scale, bias, eps, out_dtype, interpret):
    mean, var = bn_batch_stats(x, interpret=interpret)
    rstd = jax.lax.rsqrt(var + eps)
    mul = rstd * scale.astype(jnp.float32)
    y = ((x.astype(jnp.float32) - mean) * mul
         + bias.astype(jnp.float32)).astype(out_dtype)
    return (y, mean, var), (x, scale, mean, rstd)


def _fused_bn_fwd(x, scale, bias, eps, out_dtype, interpret):
    return _fwd_impl(x, scale, bias, eps, out_dtype, interpret)


def _fused_bn_bwd(eps, out_dtype, interpret, residuals, cotangents):
    x, scale, mean, rstd = residuals
    dy = cotangents[0]  # d(mean)/d(var) cotangents are zero by contract
    m = int(np.prod(x.shape[:-1]))
    s1, s2 = bn_grad_stats(dy, x, mean, rstd, interpret=interpret)
    coef = scale.astype(jnp.float32) * rstd
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = (coef * (dy.astype(jnp.float32) - s1 / m - xhat * (s2 / m))).astype(
        x.dtype)
    return dx, s2.astype(scale.dtype), s1.astype(scale.dtype)


fused_bn_train.defvjp(_fused_bn_fwd, _fused_bn_bwd)
