"""Parity tests for the MXU dot-product BatchNorm stats (ops/mxu_bn.py) —
the round-2 hot-path default — against stock flax.linen.BatchNorm: value,
grad, running-stats update, and variable-tree/checkpoint compatibility.
Also covers module swapping across all three bn_modes (mxu/fused/flax)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.models.layers import ConvBlock, FusedBatchNorm
from keras_object_detection_tpu.ops.mxu_bn import mxu_batch_stats, mxu_bn_train

CASES = [
    ((4, 7, 7, 16), jnp.float32),
    ((2, 14, 14, 64), jnp.bfloat16),
    ((3, 7, 7, 192), jnp.float32),
    ((2, 7, 7, 24), jnp.float32),
    ((5, 13, 11, 32), jnp.float32),
]


@pytest.mark.parametrize("shape,dtype", CASES)
def test_mxu_batch_stats_matches_flax_fast_variance(shape, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 3 + 1, dtype)
    mean, var = mxu_batch_stats(x)
    xf = x.astype(jnp.float32).reshape(-1, shape[-1])
    ref_mean = xf.mean(axis=0)
    ref_var = jnp.maximum(0.0, (xf * xf).mean(axis=0) - ref_mean * ref_mean)
    np.testing.assert_allclose(mean, ref_mean, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(var, ref_var, rtol=1e-5, atol=1e-5)


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
def test_mxu_bn_train_value_and_grad_parity(dtype, tol):
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

    def loss_mxu(x, scale, bias):
        y, _, _ = mxu_bn_train(x, scale, bias, 1e-3, dtype)
        return jnp.sum(y.astype(jnp.float32) * w)

    y_ref, _ = bn.apply(variables, x, mutable=["batch_stats"])
    y_mxu = mxu_bn_train(x, scale, bias, 1e-3, dtype)[0]
    assert y_mxu.dtype == y_ref.dtype
    np.testing.assert_allclose(
        y_mxu.astype(jnp.float32), y_ref.astype(jnp.float32),
        rtol=tol, atol=tol)

    g_ref = jax.grad(loss_flax, argnums=(0, 1, 2))(x, scale, bias)
    g_mxu = jax.grad(loss_mxu, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_ref, g_mxu):
        assert a.dtype == b.dtype
        scale_ref = float(jnp.abs(a.astype(jnp.float32)).max()) + 1e-6
        np.testing.assert_allclose(
            b.astype(jnp.float32) / scale_ref, a.astype(jnp.float32) / scale_ref,
            rtol=tol, atol=tol)


def test_mxu_module_matches_flax_module_train():
    c = 32
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 7, 7, c), jnp.float32)
    flax_bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                           epsilon=1e-3, dtype=jnp.float32,
                           param_dtype=jnp.float32)
    mxu_bn = FusedBatchNorm(use_running_average=False, momentum=0.99,
                            epsilon=1e-3, dtype=jnp.float32, stats="mxu")
    v_ref = flax_bn.init(jax.random.PRNGKey(0), x)
    v_mxu = mxu_bn.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_mxu))

    v = _flax_variables(c)
    y_ref, m_ref = flax_bn.apply(v, x, mutable=["batch_stats"])
    y_mxu, m_mxu = mxu_bn.apply(v, x, mutable=["batch_stats"])
    np.testing.assert_allclose(y_mxu, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m_mxu["batch_stats"]["mean"],
                               m_ref["batch_stats"]["mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m_mxu["batch_stats"]["var"],
                               m_ref["batch_stats"]["var"], rtol=1e-5, atol=1e-6)


def test_convblock_all_bn_modes_checkpoint_compatible_and_equal():
    rng = np.random.RandomState(5)
    xr = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    x0 = jnp.zeros((2, 8, 8, 3), jnp.float32)
    inits = {}
    outs = {}
    for mode in ("mxu", "fused", "flax"):
        v = ConvBlock(16, 3, padding=1, bn_mode=mode).init(
            jax.random.PRNGKey(0), x0, train=True)
        inits[mode] = v
        y, _ = ConvBlock(16, 3, padding=1, bn_mode=mode).apply(
            inits["mxu"], xr, train=True, mutable=["batch_stats"])
        outs[mode] = np.asarray(y)
    assert (jax.tree_util.tree_structure(inits["mxu"])
            == jax.tree_util.tree_structure(inits["flax"])
            == jax.tree_util.tree_structure(inits["fused"]))
    np.testing.assert_allclose(outs["mxu"], outs["flax"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["fused"], outs["flax"], rtol=1e-5, atol=1e-5)


class TestSubsetStatsBN:
    """bn_mode='flax@N' (SubsetStatsBatchNorm): full-batch subset equals
    stock flax bit-closely; smaller subsets use exactly the leading rows."""

    def _mk(self, rows, c=16, use_running_average=False):
        from keras_object_detection_tpu.models.layers import make_batch_norm
        return make_batch_norm(f"flax@{rows}",
                               use_running_average=use_running_average,
                               momentum=0.99, epsilon=1e-3,
                               dtype=jnp.float32)

    def test_full_subset_matches_flax(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 7, 7, 16) * 2 + 1, jnp.float32)
        variables = _flax_variables(16)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.99,
                          epsilon=1e-3, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        ref, ref_upd = bn.apply(variables, x, mutable=["batch_stats"])
        sub = self._mk(rows=4)
        got, got_upd = sub.apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(got_upd["batch_stats"][k]),
                np.asarray(ref_upd["batch_stats"][k]), rtol=1e-5, atol=1e-5)
        # gradients match too
        w = jnp.asarray(np.random.RandomState(1).randn(*x.shape), jnp.float32)
        gref = jax.grad(lambda xx: jnp.sum(
            bn.apply(variables, xx, mutable=["batch_stats"])[0] * w))(x)
        gsub = jax.grad(lambda xx: jnp.sum(
            sub.apply(variables, xx, mutable=["batch_stats"])[0] * w))(x)
        np.testing.assert_allclose(np.asarray(gsub), np.asarray(gref),
                                   rtol=1e-4, atol=1e-5)

    def test_partial_subset_uses_leading_rows(self):
        rng = np.random.RandomState(2)
        x = np.asarray(rng.randn(6, 5, 5, 16), np.float32)
        variables = _flax_variables(16)
        got, _ = self._mk(rows=2).apply(variables, jnp.asarray(x),
                                        mutable=["batch_stats"])
        # oracle: stats from rows [0:2), applied to every row
        sub = x[:2].reshape(-1, 16)
        mean = sub.mean(0)
        var = (sub * sub).mean(0) - mean * mean
        mul = 1.0 / np.sqrt(var + 1e-3) * np.asarray(
            variables["params"]["scale"])
        ref = (x - mean) * mul + np.asarray(variables["params"]["bias"])
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)

    def test_eval_path_identical_to_flax(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(3, 7, 7, 16), jnp.float32)
        variables = _flax_variables(16)
        bn = nn.BatchNorm(use_running_average=True, momentum=0.99,
                          epsilon=1e-3, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        ref = bn.apply(variables, x)
        got = self._mk(rows=2, use_running_average=True).apply(variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_convblock_checkpoint_compatible_and_rejects_bad(self):
        import pytest as _pytest

        from keras_object_detection_tpu.models.layers import (
            ConvBlock, make_batch_norm)

        x = jnp.ones((4, 8, 8, 3), jnp.float32)
        v1 = ConvBlock(8, 3, padding=1, bn_mode="flax").init(
            jax.random.PRNGKey(0), x, train=True)
        v2 = ConvBlock(8, 3, padding=1, bn_mode="flax@2").init(
            jax.random.PRNGKey(0), x, train=True)
        assert jax.tree_util.tree_structure(v1) == \
            jax.tree_util.tree_structure(v2)
        with _pytest.raises(ValueError):
            make_batch_norm("flax@0", use_running_average=False)
        with _pytest.raises(ValueError):
            make_batch_norm("mxu@2", use_running_average=False)
