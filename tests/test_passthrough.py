"""YOLOv2 passthrough/reorg head tests (net-new — the reference repo is
anchor-free YOLOv1 only; arXiv:1612.08242 §2 'passthrough layer'):
space_to_depth math, backbone tap geometry, head shapes, guards, a gradient
smoke test, and config round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.models.darknet import (
    DARKNET_MICRO_CONFIG, DarknetBackbone, _last_downsample_index,
)
from keras_object_detection_tpu.models.layers import space_to_depth
from keras_object_detection_tpu.models.yolo import YoloV1, build_model

ANCHORS = ((0.1, 0.15), (0.4, 0.3), (0.8, 0.8))


def _cfg(**model_kw):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3, anchors=ANCHORS),
        model=ModelConfig(backbone="darknet_micro", head="anchor",
                          image_size=56, compute_dtype="float32",
                          passthrough=True, **model_kw),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer="adam",
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
        eval=EvalConfig(conf_threshold=0.0),
    )


def test_space_to_depth_matches_manual():
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    y = np.asarray(space_to_depth(x, 2))
    assert y.shape == (2, 2, 3, 12)
    xn = np.asarray(x)
    # channel layout: the 2x2 tile unrolls row-major, channels innermost
    for b in range(2):
        for i in range(2):
            for j in range(3):
                tile = xn[b, 2 * i:2 * i + 2, 2 * j:2 * j + 2, :]
                np.testing.assert_array_equal(y[b, i, j], tile.reshape(-1))
    # pure layout transform: every input element appears exactly once
    np.testing.assert_array_equal(np.sort(y, axis=None),
                                  np.sort(xn, axis=None))


def test_space_to_depth_rejects_indivisible():
    with pytest.raises(ValueError, match="not divisible"):
        space_to_depth(jnp.zeros((1, 5, 4, 3)), 2)


def test_last_downsample_index():
    # darknet_micro: conv M conv M conv M conv -> last "M" at index 5
    assert _last_downsample_index(DARKNET_MICRO_CONFIG) == 5
    # stride-2 conv counts as a downsample
    assert _last_downsample_index(((3, 8, 1, 1), (3, 8, 2, 1))) == 1
    assert _last_downsample_index(((3, 8, 1, 1),)) == -1


def test_backbone_tap_is_2x_resolution():
    bb = DarknetBackbone(architecture=DARKNET_MICRO_CONFIG, return_tap=True)
    x = jnp.zeros((1, 56, 56, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    (out, tap), _ = bb.apply(vars_, x, train=False, mutable=["batch_stats"])
    assert out.shape == (1, 7, 7, 64)
    assert tap.shape == (1, 14, 14, 64)  # features before the last pool
    # the tap adds no parameters: same tree as the plain backbone
    plain = DarknetBackbone(architecture=DARKNET_MICRO_CONFIG)
    vars_plain = plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vars_["params"])
            == jax.tree_util.tree_structure(vars_plain["params"]))


def test_passthrough_model_shape_and_grad():
    cfg = _cfg()
    model = build_model(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 56, 56, 3),
                       jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(vars_, imgs, train=False)
    assert out.shape == (2, 7, 7, 3 * 8)
    assert jnp.isfinite(out).all()
    # the head gained passthrough parameters (3 ConvBlocks + projection)
    names = list(vars_["params"].keys())
    assert any("PassthroughConvHead" in n for n in names)

    # gradients flow through the tap branch: perturbing an early backbone
    # conv must change the head output via BOTH paths, and grads are finite
    def loss(p):
        return jnp.sum(model.apply({"params": p,
                                    "batch_stats": vars_["batch_stats"]},
                                   imgs, train=False) ** 2)
    g = jax.grad(loss)(vars_["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_passthrough_guards():
    with pytest.raises(ValueError, match="requires head='anchor'"):
        YoloV1(backbone="darknet_micro", head="conv", passthrough=True,
               num_classes=3).init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 56, 56, 3)))
    with pytest.raises(ValueError, match="darknet backbones only"):
        YoloV1(backbone="vgg16", head="anchor", anchors=ANCHORS,
               passthrough=True, num_classes=3).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))


def test_passthrough_train_step_smoke():
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_train_step)
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (2, 56, 56, 3)), jnp.uint8)
    boxes = jnp.tile(jnp.asarray([[0.5, 0.5, 0.2, 0.3, 1.0]], jnp.float32),
                     (2, 8, 1))
    valid = jnp.zeros((2, 8), bool).at[:, 0].set(True)
    state2, metrics = step(state, imgs, boxes, valid, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total"]))
    _, metrics3 = step(state2, imgs, boxes, valid, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics3["total"]))


def test_passthrough_config_roundtrip(tmp_path):
    cfg = _cfg()
    p = tmp_path / "c.json"
    p.write_text(cfg.to_json())
    cfg2 = Config.from_json(p.read_text())
    assert cfg2.model.passthrough is True
    assert build_model(cfg2).passthrough is True
