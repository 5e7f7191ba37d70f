"""Inference/evaluation tests (ref evaluate.py surface): fused
forward+decode+NMS parity with running the pieces separately, latency harness,
and dataset-level evaluation."""

import os
import shutil

import jax
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, TrainConfig,
)
from keras_object_detection_tpu.core.grid import decode_grid
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.eval.evaluator import Evaluator, InferenceModel
from keras_object_detection_tpu.ops.nms import batched_non_max_suppression
from keras_object_detection_tpu.train.loop import create_train_state

FIXTURE = "/root/reference/yolo_v1/data"


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer="adam"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    d = tmp_path_factory.mktemp("eval_data")
    for i in range(3):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"img{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"img{i}.txt")
    return cfg, state, str(d)


def test_fused_matches_unfused(setup):
    """The fused serving graph must equal forward -> decode -> NMS run
    separately (the reference's two timed variants, ref evaluate.py:37-47)."""
    cfg, state, _ = setup
    infer = InferenceModel(cfg, state.params, state.batch_stats)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, size=(2, 224, 224, 3), dtype=np.uint8)

    raw = infer.predict_raw(images)
    decoded = decode_grid(raw, cfg.grid.num_classes, cfg.grid.num_boxes)
    boxes_ref, valid_ref = batched_non_max_suppression(
        decoded, cfg.eval.iou_threshold, cfg.eval.conf_threshold)

    boxes, valid = infer.predict(images)
    np.testing.assert_allclose(boxes, np.asarray(boxes_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(valid, np.asarray(valid_ref))


def test_predict_single_shape(setup):
    cfg, state, _ = setup
    infer = InferenceModel(cfg, state.params, state.batch_stats)
    img = np.random.RandomState(1).randint(
        0, 255, size=(224, 224, 3), dtype=np.uint8)
    kept = infer.predict_single(img)
    assert kept.ndim == 2 and kept.shape[1] == 6
    assert (kept[:, 1] > cfg.eval.conf_threshold).all()


def test_benchmark_latency(setup):
    cfg, state, _ = setup
    infer = InferenceModel(cfg, state.params, state.batch_stats)
    img = np.zeros((1, 224, 224, 3), np.uint8)
    lat = infer.benchmark_latency(img, runs=3)
    assert lat["p50_ms"] > 0 and lat["min_ms"] <= lat["p50_ms"]
    assert lat["batch"] == 1


def test_evaluator_dataset(setup):
    cfg, state, data_dir = setup
    ds = YoloDataset(data_dir, cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8)
    res = Evaluator(cfg).evaluate(state, ds)
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["mAP"] <= 1.0
    assert res["images_per_s"] > 0

def test_evaluator_data_parallel_matches_single(setup):
    """Standalone dataset eval over a data-parallel mesh must equal the
    single-device path (same batches, GSPMD-partitioned forward)."""
    from keras_object_detection_tpu.parallel.mesh import create_mesh

    cfg, state, data_dir = setup
    ds = YoloDataset(data_dir, cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8)
    single = Evaluator(cfg).evaluate(state, ds, coco_map=True)
    mesh = create_mesh(data_parallel=2, devices=jax.devices()[:2])
    dp = Evaluator(cfg, mesh=mesh).evaluate(state, ds, coco_map=True)
    assert np.isclose(dp["loss"], single["loss"], rtol=1e-5, atol=1e-6)
    assert np.isclose(dp["mAP"], single["mAP"], atol=1e-6)
    assert np.isclose(dp["mAP@[.50:.95]"], single["mAP@[.50:.95]"], atol=1e-6)


def test_evaluator_mesh_batch_divisibility():
    from keras_object_detection_tpu.parallel.mesh import create_mesh

    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"),
        data=DataConfig(batch_size=3, max_boxes_per_image=8),
    )
    with pytest.raises(ValueError, match="divide"):
        Evaluator(cfg, mesh=create_mesh(data_parallel=2,
                                        devices=jax.devices()[:2]))
