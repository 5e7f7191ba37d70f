"""Export tests (ref convert_to_tflite.py surface): StableHLO round-trip
always; TFLite float + full-int8 when TensorFlow is available."""

import jax
import numpy as np
import pytest

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.export.litert import (
    export_stablehlo,
    export_tflite,
)
from keras_object_detection_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, state


def test_stablehlo_export_roundtrip(setup, tmp_path):
    cfg, state = setup
    path = str(tmp_path / "model.stablehlo")
    blob = export_stablehlo(cfg, state.params, state.batch_stats, path)
    assert len(blob) > 1000
    # deserialize and run through jax.export
    rehydrated = jax.export.deserialize(open(path, "rb").read())
    x = np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32)
    out = rehydrated.call(x)
    assert out.shape == (1, 7, 7, 13)
    # matches the live model
    from keras_object_detection_tpu.models.yolo import build_model

    live = build_model(cfg).apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               rtol=1e-5, atol=1e-5)


def test_tflite_export_float(setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    cfg, state = setup
    path = str(tmp_path / "model.tflite")
    blob = export_tflite(cfg, state.params, state.batch_stats, path)
    assert len(blob) > 1000

    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    x = np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(out["index"])
    assert y.shape == (1, 7, 7, 13)

    from keras_object_detection_tpu.models.yolo import build_model

    live = np.asarray(build_model(cfg).apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False))
    np.testing.assert_allclose(y, live, rtol=1e-3, atol=1e-3)


def test_tflite_export_int8(setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    cfg, state = setup

    def rep():
        rng = np.random.RandomState(0)
        for _ in range(8):  # small calibration set for test speed
            yield [rng.rand(1, 224, 224, 3).astype(np.float32)]

    path = str(tmp_path / "model_int8.tflite")
    blob = export_tflite(cfg, state.params, state.batch_stats, path,
                         quantize_int8=True, representative_dataset=rep)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    # uint8 I/O per the reference recipe (ref convert_to_tflite.py:28-29)
    assert inp["dtype"] == np.uint8 and out["dtype"] == np.uint8
    x = np.random.RandomState(0).randint(
        0, 255, size=(1, 224, 224, 3), dtype=np.uint8)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    y = interp.get_tensor(out["index"])
    assert y.shape == (1, 7, 7, 13)


ANCHORS6 = ((0.8, 0.7), (0.5, 0.6), (0.35, 0.3),
            (0.2, 0.25), (0.12, 0.1), (0.05, 0.06))


@pytest.fixture(scope="module")
def fpn_setup():
    from keras_object_detection_tpu.config import DataConfig

    cfg = Config(
        grid=GridConfig(grid=7, num_classes=3, anchors=ANCHORS6),
        model=ModelConfig(backbone="darknet_micro", head="fpn",
                          fpn_scales=2, image_size=56,
                          compute_dtype="float32",
                          activation="leaky_relu"),
        data=DataConfig(batch_size=1),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    return cfg, state


def test_stablehlo_export_fpn_multi_output(fpn_setup, tmp_path):
    """fpn export emits one output per scale (coarse -> fine), each matching
    the live model."""
    cfg, state = fpn_setup
    path = str(tmp_path / "fpn.stablehlo")
    blob = export_stablehlo(cfg, state.params, state.batch_stats, path)
    assert len(blob) > 1000
    rehydrated = jax.export.deserialize(open(path, "rb").read())
    x = np.random.RandomState(0).rand(1, 56, 56, 3).astype(np.float32)
    outs = rehydrated.call(x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 7, 7, 24), (1, 14, 14, 24)]

    from keras_object_detection_tpu.models.yolo import build_model

    live = build_model(cfg).apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)
    for got, want in zip(outs, live):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_tflite_export_fpn_float(fpn_setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    cfg, state = fpn_setup
    path = str(tmp_path / "fpn.tflite")
    blob = export_tflite(cfg, state.params, state.batch_stats, path)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    x = np.random.RandomState(0).rand(1, 56, 56, 3).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    # output order in the flatbuffer is not contractual — match by shape
    # (grids differ per scale)
    got = {tuple(d["shape"]): interp.get_tensor(d["index"])
           for d in interp.get_output_details()}
    assert set(got) == {(1, 7, 7, 24), (1, 14, 14, 24)}

    from keras_object_detection_tpu.models.yolo import build_model

    live = build_model(cfg).apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)
    for want in live:
        np.testing.assert_allclose(got[tuple(want.shape)],
                                   np.asarray(want), rtol=1e-3, atol=1e-3)


def test_tflite_export_fpn_int8(fpn_setup, tmp_path):
    tf = pytest.importorskip("tensorflow")
    cfg, state = fpn_setup

    def rep():
        rng = np.random.RandomState(0)
        for _ in range(4):
            yield [rng.rand(1, 56, 56, 3).astype(np.float32)]

    path = str(tmp_path / "fpn_int8.tflite")
    blob = export_tflite(cfg, state.params, state.batch_stats, path,
                         quantize_int8=True, representative_dataset=rep)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    assert inp["dtype"] == np.uint8
    assert all(d["dtype"] == np.uint8 for d in interp.get_output_details())
    x = np.random.RandomState(0).randint(
        0, 255, size=(1, 56, 56, 3), dtype=np.uint8)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    shapes = {tuple(d["shape"]) for d in interp.get_output_details()}
    assert shapes == {(1, 7, 7, 24), (1, 14, 14, 24)}


def test_tflite_export_int8_from_bf16_config(tmp_path):
    """Full-int8 export must work from a bf16-trained config: params are f32
    either way, and the exporter forces a float32 serving graph (bf16 pad ops
    are not legalizable to int8 TFLite — regression test)."""
    tf = pytest.importorskip("tensorflow")
    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="bfloat16"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    def rep():
        rng = np.random.RandomState(0)
        for _ in range(4):
            yield [rng.rand(1, 224, 224, 3).astype(np.float32)]

    path = str(tmp_path / "model_int8_bf16.tflite")
    blob = export_tflite(cfg, state.params, state.batch_stats, path,
                         quantize_int8=True, representative_dataset=rep)
    interp = tf.lite.Interpreter(model_content=blob)
    interp.allocate_tensors()
    assert interp.get_input_details()[0]["dtype"] == np.uint8
    x = np.zeros((1, 224, 224, 3), dtype=np.uint8)
    interp.set_tensor(interp.get_input_details()[0]["index"], x)
    interp.invoke()
    y = interp.get_tensor(interp.get_output_details()[0]["index"])
    assert y.shape == (1, 7, 7, 13)
