"""Data-parallel sharded serving (InferenceModel/Int8InferenceModel
``mesh=``): bit-parity with single-device serving, batch-divisibility
guards, and the staged-benchmark restriction.

Net-new vs the reference (single-GPU serving only, SURVEY.md §2.2); runs on
the conftest's 8 fake CPU devices like the training DP-parity tests.
"""

import dataclasses

import numpy as np
import pytest

from keras_object_detection_tpu.config import tiny_cpu_config
from keras_object_detection_tpu.eval.evaluator import InferenceModel
from keras_object_detection_tpu.export.int8_serving import Int8InferenceModel
from keras_object_detection_tpu.parallel.mesh import create_mesh
from tests.test_int8_serving import _micro_cfg, _trained_like_variables


def _dp_mesh(n):
    import jax

    return create_mesh(data_parallel=n, devices=jax.devices()[:n])


def _setup(cfg=None, **model_over):
    cfg = cfg if cfg is not None else _micro_cfg(**model_over)
    params, stats = _trained_like_variables(cfg)
    imgs = np.random.RandomState(7).randint(
        0, 256, (8, cfg.model.image_size, cfg.model.image_size, 3), np.uint8)
    return cfg, params, stats, imgs


def test_sharded_float_serving_matches_single_device():
    cfg, params, stats, imgs = _setup()
    mesh = _dp_mesh(4)
    single = InferenceModel(cfg, params, stats)
    sharded = InferenceModel(cfg, params, stats, mesh=mesh)
    # per-shard conv shapes differ from the full batch, so XLA may
    # reassociate float sums differently — semantics equal, bits within eps
    np.testing.assert_allclose(np.asarray(single.predict_raw(imgs)),
                               np.asarray(sharded.predict_raw(imgs)),
                               atol=1e-5, rtol=1e-5)
    b0, v0 = single.predict(imgs)
    b1, v1 = sharded.predict(imgs)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_allclose(b0[v0], b1[v1], atol=1e-5, rtol=1e-5)


def test_sharded_int8_serving_matches_single_device():
    cfg, params, stats, imgs = _setup()
    mesh = _dp_mesh(8)
    single = Int8InferenceModel(cfg, params, stats)
    sharded = Int8InferenceModel(cfg, params, stats, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(single.predict_raw(imgs)),
                                  np.asarray(sharded.predict_raw(imgs)))


def test_sharded_serving_fpn_head():
    cfg = _micro_cfg(head="fpn", fpn_scales=2, activation="leaky_relu")
    g = dataclasses.replace(
        tiny_cpu_config().grid,
        anchors=((0.1, 0.15), (0.3, 0.3), (0.2, 0.4), (0.5, 0.5)))
    cfg = dataclasses.replace(cfg, grid=g)
    cfg, params, stats, imgs = _setup(cfg=cfg)
    mesh = _dp_mesh(4)
    single = InferenceModel(cfg, params, stats)
    sharded = InferenceModel(cfg, params, stats, mesh=mesh)
    b0, v0 = single.predict(imgs)
    b1, v1 = sharded.predict(imgs)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_allclose(b0[v0], b1[v1], atol=1e-5, rtol=1e-5)


def test_sharded_serving_batch_guard_and_staged_guard():
    cfg, params, stats, imgs = _setup()
    mesh = _dp_mesh(8)
    sharded = InferenceModel(cfg, params, stats, mesh=mesh)
    with pytest.raises(ValueError, match="divide"):
        sharded.predict(imgs[:3])
    with pytest.raises(ValueError, match="single-device"):
        sharded.benchmark_latency(imgs, staged=True)
    # fused latency benchmarking still works under a mesh
    out = sharded.benchmark_latency(imgs, runs=2)
    assert out["batch"] == 8
