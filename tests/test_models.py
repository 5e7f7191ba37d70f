"""Model construction/shape tests (ref model.py surface). Heavy variants are
checked with jax.eval_shape (no FLOPs); the tiny model runs real forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.models import YoloV1, build_model


def _shape_check(model, size, out_shape):
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(rng, x, train=False))
    out = jax.eval_shape(
        lambda v: model.apply(v, x, train=False,
                              rngs={"dropout": rng}), variables)
    assert out.shape == (2,) + out_shape, f"got {out.shape}"


def test_darknet24_conv_head_shape():
    m = YoloV1(backbone="darknet24", head="conv", num_classes=20, num_boxes=2)
    _shape_check(m, 448, (7, 7, 30))


def test_darknet24_gap_dense_head_shape():
    m = YoloV1(backbone="darknet24", head="gap_dense", num_classes=20)
    _shape_check(m, 448, (7, 7, 30))


def test_vgg16_flatten_dense_shape():
    m = YoloV1(backbone="vgg16", head="flatten_dense", num_classes=20)
    _shape_check(m, 448, (7, 7, 30))


def test_mobilenetv2_conv_shape():
    m = YoloV1(backbone="mobilenetv2", head="conv", num_classes=20)
    _shape_check(m, 448, (7, 7, 30))


def test_flat_output_variant():
    # the modular reference scripts emit flat (ref model.py:107)
    m = YoloV1(backbone="darknet_tiny", head="gap_dense", num_classes=3,
               flat_output=True)
    _shape_check(m, 224, (7 * 7 * 13,))


def test_tiny_real_forward_and_grad():
    m = YoloV1(backbone="darknet_tiny", head="conv", num_classes=3)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 224, 224, 3), jnp.float32)
    variables = m.init(rng, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 7, 7, 13)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(params):
        y = m.apply({"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)


def test_bfloat16_compute_dtype():
    m = YoloV1(backbone="darknet_tiny", head="conv", num_classes=3,
               compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = m.init(rng, x, train=False)
    # params stay f32, output head stays f32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    out = m.apply(variables, x, train=False)
    assert out.dtype == jnp.float32


def test_build_model_from_config():
    cfg = Config(grid=GridConfig(num_classes=3),
                 model=ModelConfig(backbone="darknet_tiny", image_size=224,
                                   compute_dtype="float32"))
    m = build_model(cfg)
    assert m.num_classes == 3 and m.backbone == "darknet_tiny"


def test_unknown_head_raises():
    m = YoloV1(backbone="darknet_tiny", head="bogus", num_classes=3)
    with pytest.raises(ValueError, match="unknown head"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False)
