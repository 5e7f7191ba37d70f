"""Parity tests for the Pallas fused BatchNorm stats kernels
(ops/pallas_bn.py) and the FusedBatchNorm module against stock
flax.linen.BatchNorm — value, grad, running-stats update, and variable-tree
compatibility. Runs in interpreter mode on the CPU test mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.models.layers import ConvBlock, FusedBatchNorm
from keras_object_detection_tpu.ops.pallas_bn import (
    bn_batch_stats,
    bn_grad_stats,
    fused_bn_train,
)

# (shape, dtype): covers the lane-fold path (C=16 folds x8, C=64 folds x2),
# the no-fold path (C=192), and a non-power-of-two channel count (C=24).
CASES = [
    ((4, 7, 7, 16), jnp.float32),
    ((2, 14, 14, 64), jnp.bfloat16),
    ((3, 7, 7, 192), jnp.float32),
    ((2, 7, 7, 24), jnp.float32),
    ((5, 13, 11, 32), jnp.float32),  # odd spatial dims -> remainder masking
]


@pytest.mark.parametrize("shape,dtype", CASES)
def test_bn_batch_stats_matches_flax_fast_variance(shape, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 3 + 1, dtype)
    mean, var = bn_batch_stats(x, interpret=True)
    xf = x.astype(jnp.float32).reshape(-1, shape[-1])
    ref_mean = xf.mean(axis=0)
    ref_var = jnp.maximum(0.0, (xf * xf).mean(axis=0) - ref_mean * ref_mean)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(var, ref_var, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,dtype", CASES)
def test_bn_grad_stats_matches_direct_reduction(shape, dtype):
    rng = np.random.RandomState(1)
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape), dtype)
    dy = jnp.asarray(rng.randn(*shape), dtype)
    mean, var = bn_batch_stats(x, interpret=True)
    rstd = jax.lax.rsqrt(var + 1e-3)
    s1, s2 = bn_grad_stats(dy, x, mean, rstd, interpret=True)
    dyf = dy.astype(jnp.float32).reshape(-1, c)
    xhat = (x.astype(jnp.float32).reshape(-1, c) - mean) * rstd
    np.testing.assert_allclose(s1, dyf.sum(0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(s2, (dyf * xhat).sum(0), rtol=1e-4, atol=1e-4)


def _flax_variables(c):
    rng = np.random.RandomState(2)
    return {
        "params": {
            "scale": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
            "bias": jnp.asarray(rng.randn(c), jnp.float32),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.randn(c), jnp.float32),
            "var": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        },
    }


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-6), (jnp.bfloat16, 0.05)])
def test_fused_bn_train_value_and_grad_parity(dtype, tol):
    c = 64
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 14, 14, c), dtype)
    w = jnp.asarray(rng.randn(2, 14, 14, c), jnp.float32)
    variables = _flax_variables(c)
    scale = variables["params"]["scale"]
    bias = variables["params"]["bias"]
    bn = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=1e-3,
                      dtype=dtype, param_dtype=jnp.float32)

    def loss_flax(x, scale, bias):
        v = {"params": {"scale": scale, "bias": bias},
             "batch_stats": variables["batch_stats"]}
        y, _ = bn.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) * w)

    def loss_fused(x, scale, bias):
        y, _, _ = fused_bn_train(x, scale, bias, 1e-3, dtype, True)
        return jnp.sum(y.astype(jnp.float32) * w)

    y_ref, _ = bn.apply(variables, x, mutable=["batch_stats"])
    y_fused = fused_bn_train(x, scale, bias, 1e-3, dtype, True)[0]
    assert y_fused.dtype == y_ref.dtype
    np.testing.assert_allclose(
        y_fused.astype(jnp.float32), y_ref.astype(jnp.float32),
        rtol=tol, atol=tol)

    g_ref = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_ref, g_fused):
        assert a.dtype == b.dtype
        scale_ref = float(jnp.abs(a.astype(jnp.float32)).max()) + 1e-6
        np.testing.assert_allclose(
            b.astype(jnp.float32) / scale_ref, a.astype(jnp.float32) / scale_ref,
            rtol=tol, atol=tol)


def test_fused_module_matches_flax_module_train_and_eval():
    c = 32
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 7, 7, c), jnp.float32)
    flax_bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                           epsilon=1e-3, dtype=jnp.float32,
                           param_dtype=jnp.float32)
    fused_bn = FusedBatchNorm(use_running_average=False, momentum=0.99,
                              epsilon=1e-3, dtype=jnp.float32, interpret=True)
    v_ref = flax_bn.init(jax.random.PRNGKey(0), x)
    v_fused = fused_bn.init(jax.random.PRNGKey(0), x)
    # identical variable trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fused)

    v = _flax_variables(c)
    y_ref, m_ref = flax_bn.apply(v, x, mutable=["batch_stats"])
    y_fused, m_fused = fused_bn.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m_fused["batch_stats"]["mean"],
                               m_ref["batch_stats"]["mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_fused["batch_stats"]["var"],
                               m_ref["batch_stats"]["var"], rtol=1e-5, atol=1e-6)

    # eval path: running averages, bit-comparable formula
    flax_eval = nn.BatchNorm(use_running_average=True, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    fused_eval = FusedBatchNorm(use_running_average=True, momentum=0.99,
                                epsilon=1e-3, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(fused_eval.apply(v, x), flax_eval.apply(v, x),
                               rtol=1e-6, atol=1e-6)


def test_convblock_bn_modes_are_checkpoint_compatible():
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    v_fused = ConvBlock(16, 3, padding=1, bn_mode="fused").init(
        jax.random.PRNGKey(0), x, train=True)
    v_flax = ConvBlock(16, 3, padding=1, bn_mode="flax").init(
        jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(v_flax))
    # same init values -> same forward output in both modes
    rng = np.random.RandomState(5)
    xr = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    y_fused, s_fused = ConvBlock(16, 3, padding=1, bn_mode="fused").apply(
        v_fused, xr, train=True, mutable=["batch_stats"])
    y_flax, s_flax = ConvBlock(16, 3, padding=1, bn_mode="flax").apply(
        v_fused, xr, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(y_fused, y_flax, rtol=1e-5, atol=1e-5)
