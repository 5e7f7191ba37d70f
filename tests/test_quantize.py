"""JAX-native int8 weight quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.export.quantize import (
    QuantizedInferenceModel,
    dequantize_params,
    quantize_params,
    quantized_size_bytes,
)
from keras_object_detection_tpu.models.yolo import build_model
from keras_object_detection_tpu.train.loop import create_train_state


def _cfg():
    return Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"))


def test_quantize_roundtrip_error_small():
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 128)),
                               jnp.float32),
              "b": jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32)}
    q = quantize_params(params)
    back = dequantize_params(q)
    # large kernel: rounding error bounded by one quantization step
    err = np.abs(np.asarray(back["w"]) - np.asarray(params["w"])).max()
    step = float(np.abs(np.asarray(params["w"])).max()) / 127.0
    assert err <= step + 1e-7
    # small bias: untouched
    np.testing.assert_array_equal(np.asarray(back["b"]),
                                  np.asarray(params["b"]))


def test_quantized_size_reduction():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    q = quantize_params(state.params)
    qbytes, fbytes = quantized_size_bytes(q)
    assert qbytes < 0.35 * fbytes  # ~4x smaller (f32 BN/bias leaves remain)


def test_quantized_inference_close_to_float():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, size=(2, 224, 224, 3), dtype=np.uint8)

    from keras_object_detection_tpu.eval.evaluator import InferenceModel

    fm = InferenceModel(cfg, state.params, state.batch_stats)
    qm = QuantizedInferenceModel(cfg, state.params, state.batch_stats)
    f_raw = np.asarray(fm.predict_decoded(images))
    # compare raw decoded confidences/boxes: int8 weights stay close
    model = build_model(cfg)
    q_out = model.apply(
        {"params": dequantize_params(quantize_params(state.params)),
         "batch_stats": state.batch_stats},
        jnp.asarray(images).astype(jnp.float32) / 255.0, train=False)
    from keras_object_detection_tpu.core.grid import decode_grid

    q_raw = np.asarray(decode_grid(q_out, 3, 2))
    assert np.abs(f_raw[..., 1] - q_raw[..., 1]).max() < 0.15  # confidences
    # the served path runs end to end
    boxes, valid = qm.predict(images)
    assert boxes.shape == (2, 49, 6)
    mem = qm.memory_footprint()
    assert mem["quantized_bytes"] < mem["float_bytes"]
