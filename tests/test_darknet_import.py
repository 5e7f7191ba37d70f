"""Darknet .weights import/export (models/darknet_import.py).

Round-trip is asserted at the FUNCTION level: save -> load must reproduce
the identical eval-mode forward pass even though the representation moves
(conv bias folded into the rolling mean, BN-eps 1e-3 <-> 1e-5 rescale).
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import tiny_cpu_config
from keras_object_detection_tpu.models.darknet_import import (
    load_darknet_backbone, save_darknet_backbone)
from keras_object_detection_tpu.models.pretrained import (
    load_pretrained_backbone)
from keras_object_detection_tpu.models.yolo import build_model
from keras_object_detection_tpu.train.loop import create_train_state


def _randomized_state(seed=0):
    """Train state with non-trivial BN stats / conv biases so the folds are
    actually exercised."""
    cfg = tiny_cpu_config()
    state = create_train_state(cfg, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)

    def jitter(leaf):
        a = np.asarray(leaf, np.float32)
        return jnp.asarray(a + rng.normal(0, 0.1, a.shape).astype(np.float32))

    params = jax.tree_util.tree_map(jitter, jax.device_get(state.params))
    stats = jax.tree_util.tree_map(
        lambda x: jnp.abs(jitter(x)) + 0.05, jax.device_get(state.batch_stats))
    return cfg, state.replace(params=params, batch_stats=stats)


def _forward(cfg, params, stats, x):
    model = build_model(cfg)
    return model.apply({"params": params, "batch_stats": stats}, x,
                       train=False)


def test_save_load_roundtrip_function_identity(tmp_path):
    cfg, state = _randomized_state()
    path = str(tmp_path / "bb.weights")
    info = save_darknet_backbone(state.params, state.batch_stats, path)
    assert info["saved_convs"] == 6  # darknet_tiny has 6 convs

    fresh = create_train_state(cfg, jax.random.PRNGKey(99))
    params, stats, linfo = load_darknet_backbone(
        fresh.params, fresh.batch_stats, path)
    assert linfo["loaded_convs"] == 6
    assert linfo["leftover_bytes"] == 0

    x = jnp.asarray(np.random.RandomState(1).rand(2, 56, 56, 3), jnp.float32)
    # head params differ between the two states: compare the BACKBONE output
    # by grafting the original head onto the loaded tree
    params = dict(params)
    stats = dict(stats)
    for k in params:
        if not k.startswith("DarknetBackbone"):
            params[k] = state.params[k]
    for k in stats:
        if not k.startswith("DarknetBackbone"):
            stats[k] = state.batch_stats[k]
    y_orig = _forward(cfg, state.params, state.batch_stats, x)
    y_load = _forward(cfg, params, stats, x)
    np.testing.assert_allclose(np.asarray(y_load), np.asarray(y_orig),
                               rtol=2e-5, atol=2e-6)
    # conv bias was folded away: loaded biases are exactly zero
    bb = params["DarknetBackbone_0"]
    assert all(float(jnp.abs(bb[b]["Conv_0"]["bias"]).max()) == 0.0
               for b in bb)


def test_eps_rescale_is_exact(tmp_path):
    cfg, state = _randomized_state(seed=3)
    path = str(tmp_path / "bb.weights")
    save_darknet_backbone(state.params, state.batch_stats, path)
    params, stats, _ = load_darknet_backbone(
        state.params, state.batch_stats, path)
    blk = "ConvBlock_0"
    g_ours = np.asarray(
        state.params["DarknetBackbone_0"][blk]["BatchNorm_0"]["scale"])
    v = np.asarray(
        state.batch_stats["DarknetBackbone_0"][blk]["BatchNorm_0"]["var"])
    g_load = np.asarray(
        params["DarknetBackbone_0"][blk]["BatchNorm_0"]["scale"])
    v_load = np.asarray(
        stats["DarknetBackbone_0"][blk]["BatchNorm_0"]["var"])
    # the eval-mode normalizer scale/sqrt(var+eps) must be preserved
    np.testing.assert_allclose(g_load / np.sqrt(v_load + 1e-3),
                               g_ours / np.sqrt(v + 1e-3), rtol=1e-6)


def test_partial_conv_nn_file(tmp_path):
    cfg, state = _randomized_state(seed=5)
    path = str(tmp_path / "bb.conv.3")
    info = save_darknet_backbone(state.params, state.batch_stats, path,
                                 num_convs=3)
    assert info["saved_convs"] == 3
    fresh = create_train_state(cfg, jax.random.PRNGKey(42))
    params, stats, linfo = load_darknet_backbone(
        fresh.params, fresh.batch_stats, path)
    assert linfo["loaded_convs"] == 3 and linfo["total_convs"] == 6
    bb_new, bb_old = params["DarknetBackbone_0"], \
        jax.device_get(fresh.params)["DarknetBackbone_0"]
    # first 3 convs replaced, rest untouched
    k0 = np.asarray(bb_new["ConvBlock_0"]["Conv_0"]["kernel"])
    assert not np.allclose(
        k0, np.asarray(bb_old["ConvBlock_0"]["Conv_0"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(bb_new["ConvBlock_5"]["Conv_0"]["kernel"]),
        np.asarray(bb_old["ConvBlock_5"]["Conv_0"]["kernel"]))
    # strict mode refuses a partial file
    with pytest.raises(EOFError):
        load_darknet_backbone(fresh.params, fresh.batch_stats, path,
                              strict=True)


def test_misaligned_file_raises(tmp_path):
    cfg, state = _randomized_state(seed=7)
    path = str(tmp_path / "bb.weights")
    save_darknet_backbone(state.params, state.batch_stats, path)
    with open(path, "ab") as f:  # trailing garbage
        f.write(b"\x00" * 8)
    with pytest.raises(ValueError, match="remain after all"):
        load_darknet_backbone(state.params, state.batch_stats, path)
    # truncate INSIDE a record -> misalignment error, not silent partial
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2 + 3])
    with pytest.raises((ValueError, EOFError)):
        load_darknet_backbone(state.params, state.batch_stats, path)


def test_legacy_int32_seen_header(tmp_path):
    cfg, state = _randomized_state(seed=9)
    path = str(tmp_path / "bb.weights")
    save_darknet_backbone(state.params, state.batch_stats, path, seen=1234)
    data = open(path, "rb").read()
    # rewrite the v0.2 header (3i + int64 seen) as v0.1 (3i + int32 seen)
    legacy = struct.pack("<4i", 0, 1, 0, 1234) + data[20:]
    with open(path, "wb") as f:
        f.write(legacy)
    _, _, info = load_darknet_backbone(state.params, state.batch_stats, path)
    assert info["version"] == "0.1.0" and info["seen"] == 1234
    assert info["loaded_convs"] == 6


def test_not_a_weights_file_raises(tmp_path):
    path = str(tmp_path / "junk.weights")
    with open(path, "wb") as f:
        f.write(b"PNG....definitely not floats....")
    cfg, state = _randomized_state()
    with pytest.raises(ValueError, match="implausible|too short"):
        load_darknet_backbone(state.params, state.batch_stats, path)


def test_pretrained_backbone_dispatch(tmp_path):
    """--pretrained-backbone with a .weights file routes darknet backbones
    through the importer (models/pretrained.py)."""
    cfg, state = _randomized_state(seed=11)
    path = str(tmp_path / "bb.weights")
    save_darknet_backbone(state.params, state.batch_stats, path)
    fresh = create_train_state(cfg, jax.random.PRNGKey(21))
    variables = {"params": fresh.params, "batch_stats": fresh.batch_stats}
    out = load_pretrained_backbone(variables, cfg.model.backbone, path)
    got = np.asarray(
        out["params"]["DarknetBackbone_0"]["ConvBlock_0"]["Conv_0"]["kernel"])
    want_src = np.asarray(
        state.params["DarknetBackbone_0"]["ConvBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, want_src, rtol=1e-6)
