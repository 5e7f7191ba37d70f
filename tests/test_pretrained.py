"""Pretrained-backbone conversion + freezing tests (ref model.py:178
``weights='imagenet'``, ref yolo_v1.py:818-820 frozen/unfrozen ablation).

The container has no network, so the converter is validated the way VERDICT
prescribes: build a randomly-initialized Keras model, convert, and assert
Keras forward == flax forward on identical weights (rtol <= 1e-5). The .h5
path is exercised by saving that Keras model to disk first.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import tiny_cpu_config
from keras_object_detection_tpu.models.backbones import (
    MobileNetV2Backbone,
    VGG16Backbone,
)
from keras_object_detection_tpu.models.pretrained import (
    BACKBONE_PARAM_KEYS,
    keras_mobilenetv2_to_flax,
    keras_vgg16_to_flax,
    load_pretrained_backbone,
)

tf = pytest.importorskip("tensorflow")

SIZE = 96  # small enough for fast CPU forwards; >= keras minimum of 32


def _randomize_keras(model, seed):
    """Give every layer non-trivial weights (random init + fresh BN moving
    stats would otherwise collapse outputs toward zero, making the parity
    comparison vacuous)."""
    rng = np.random.RandomState(seed)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        if layer.__class__.__name__ == "BatchNormalization":
            c = ws[0].shape[0]
            layer.set_weights([
                rng.uniform(0.8, 1.2, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.05, c).astype(np.float32),
                rng.uniform(0.8, 1.2, c).astype(np.float32),
            ])
        else:
            layer.set_weights(
                [rng.normal(0, 0.08, w.shape).astype(np.float32) for w in ws])


def test_vgg16_converter_forward_parity(tmp_path):
    km = tf.keras.applications.VGG16(weights=None, include_top=False,
                                     input_shape=(SIZE, SIZE, 3))
    _randomize_keras(km, seed=0)
    h5 = os.path.join(tmp_path, "vgg16.weights.h5")
    km.save_weights(h5)

    x = np.random.RandomState(1).rand(2, SIZE, SIZE, 3).astype(np.float32)
    ref = km(x, training=False).numpy()

    converted = keras_vgg16_to_flax(h5)  # exercises the .h5 load path
    out = VGG16Backbone(dtype=jnp.float32).apply(
        {"params": converted["params"]}, jnp.asarray(x))
    # 13 compounding conv layers give outputs ~1e4; compare relative to the
    # tensor magnitude (same bar as rtol=1e-5 on normalized values).
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale,
                               rtol=1e-5, atol=1e-5)


def test_mobilenetv2_converter_forward_parity():
    km = tf.keras.applications.MobileNetV2(weights=None, include_top=False,
                                           input_shape=(SIZE, SIZE, 3))
    _randomize_keras(km, seed=2)
    x = np.random.RandomState(3).rand(2, SIZE, SIZE, 3).astype(np.float32)
    ref = km(x, training=False).numpy()

    converted = keras_mobilenetv2_to_flax(km)
    out = MobileNetV2Backbone(dtype=jnp.float32, bn_mode="flax").apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        jnp.asarray(x), train=False)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out) / scale, ref / scale,
                               rtol=1e-5, atol=1e-5)


def test_load_pretrained_backbone_grafts_and_validates():
    from keras_object_detection_tpu.models.yolo import YoloV1

    km = tf.keras.applications.VGG16(weights=None, include_top=False,
                                     input_shape=(SIZE, SIZE, 3))
    _randomize_keras(km, seed=4)
    model = YoloV1(backbone="vgg16", head="conv", grid=3, num_classes=3,
                   num_boxes=2, compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    grafted = load_pretrained_backbone(dict(variables), "vgg16", km)
    key = BACKBONE_PARAM_KEYS["vgg16"]
    kernel = np.asarray(grafted["params"][key]["Conv_0"]["kernel"])
    np.testing.assert_allclose(kernel, km.layers[1].get_weights()[0])
    # head untouched
    assert grafted["params"]["ConvHead_0"] is variables["params"]["ConvHead_0"]
    # model still runs with grafted weights (head batch_stats from init)
    out = model.apply({"params": grafted["params"],
                       "batch_stats": grafted["batch_stats"]},
                      jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    assert out.shape == (1, 3, 3, 13)

    # shape validation: wrong backbone size must be rejected
    km_small = tf.keras.applications.VGG16(weights=None, include_top=False,
                                           input_shape=(SIZE, SIZE, 3))
    bad = keras_vgg16_to_flax(km_small)
    bad["params"]["Conv_0"]["kernel"] = bad["params"]["Conv_0"]["kernel"][..., :8]
    import keras_object_detection_tpu.models.pretrained as pt

    orig = pt._CONVERTERS["vgg16"]
    pt._CONVERTERS["vgg16"] = lambda src: bad
    try:
        with pytest.raises(ValueError, match="shape"):
            load_pretrained_backbone(dict(variables), "vgg16", km_small)
    finally:
        pt._CONVERTERS["vgg16"] = orig


def test_freeze_backbone_keeps_backbone_params_fixed():
    from keras_object_detection_tpu.train.loop import (
        create_train_state,
        make_train_step,
    )

    cfg = tiny_cpu_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, backbone="darknet_micro",
                                  image_size=56, freeze_backbone=True),
        data=dataclasses.replace(cfg.data, batch_size=2))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))

    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, size=(2, 56, 56, 3), dtype=np.uint8)
    boxes = np.zeros((2, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.4, 1.0]
    valid = np.zeros((2, 8), bool)
    valid[:, 0] = True

    before = jax.device_get(state.params)
    before_stats = jax.device_get(state.batch_stats)
    for i in range(2):
        state, metrics = step(state, images, boxes, valid, jax.random.PRNGKey(i))
    after = jax.device_get(state.params)
    after_stats = jax.device_get(state.batch_stats)

    key = BACKBONE_PARAM_KEYS["darknet_micro"]
    frozen_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), before[key], after[key]))
    assert frozen_same, "backbone params changed despite freeze_backbone"
    # Keras trainable=False: frozen BN runs in inference mode — its moving
    # statistics must not update either (ref yolo_v1.py:819-820 semantics)
    stats_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)),
        before_stats[key], after_stats[key]))
    assert stats_same, "backbone batch_stats changed despite freeze_backbone"
    head_moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before["ConvHead_0"]),
                        jax.tree_util.tree_leaves(after["ConvHead_0"])))
    assert head_moved, "head params did not train"


def test_create_train_state_loads_pretrained_h5(tmp_path):
    from keras_object_detection_tpu.train.loop import create_train_state

    km = tf.keras.applications.VGG16(weights=None, include_top=False,
                                     input_shape=(SIZE, SIZE, 3))
    _randomize_keras(km, seed=5)
    h5 = os.path.join(tmp_path, "vgg16.weights.h5")
    km.save_weights(h5)

    cfg = tiny_cpu_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone="vgg16", image_size=SIZE,
            pretrained_backbone=h5))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    key = BACKBONE_PARAM_KEYS["vgg16"]
    got = np.asarray(state.params[key]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, km.layers[1].get_weights()[0])
