"""QAT fake-quant fine-tune (export/qat.py): freeze fidelity, distillation
progress, and the Int8InferenceModel qat_steps surface.

The reference's int8 recipe stops at commented-out PTQ (ref
convert_to_tflite.py:17-30); QAT is the framework's beyond-parity lever —
these tests pin its semantics against the PTQ path it must extend.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import tiny_cpu_config
from keras_object_detection_tpu.export.int8_serving import (
    Int8InferenceModel,
    build_int8_layers,
    calibrate_activation_scales,
    int8_forward,
)
from keras_object_detection_tpu.export.qat import (
    fake_quant_act,
    fake_quant_kernel,
    freeze_qat_layers,
    qat_finetune,
    qat_layers,
)
from tests.test_int8_serving import _micro_cfg, _trained_like_variables


def _images(cfg, n=8, seed=3):
    rng = np.random.RandomState(seed)
    s = cfg.model.image_size
    return rng.randint(0, 256, (n, s, s, 3), np.uint8)


def test_fake_quant_kernel_matches_serving_grid():
    rng = np.random.RandomState(0)
    w = rng.normal(0, 0.2, (3, 3, 4, 8)).astype(np.float32)
    from keras_object_detection_tpu.export.int8_serving import (
        _quantize_kernel)

    q, scale = _quantize_kernel(w)
    np.testing.assert_allclose(
        np.asarray(fake_quant_kernel(jnp.asarray(w))),
        q.astype(np.float32) * scale, rtol=0, atol=1e-7)


def test_fake_quant_act_ste_gradient_is_identity_inside_range():
    # STE: d(fake_quant)/dx == 1 wherever the input is representable
    x = jnp.linspace(-0.9, 0.9, 16).reshape(1, 2, 2, 4)
    g = jax.grad(lambda v: jnp.sum(fake_quant_act(v)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-7)


def test_freeze_at_zero_steps_equals_ptq_layers():
    """qat_layers -> freeze (no training) must reproduce the PTQ int8 layer
    list exactly — same kernels, scales, biases."""
    cfg = _micro_cfg()
    params, stats = _trained_like_variables(cfg)
    plan, ptq = build_int8_layers(cfg, params, stats)
    plan2, student = qat_layers(cfg, params, stats)
    assert plan2 == plan
    frozen = freeze_qat_layers(student)
    assert len(frozen) == len(ptq)
    for f, p in zip(frozen, ptq):
        for k in p:
            np.testing.assert_array_equal(np.asarray(f[k]), np.asarray(p[k]))


def test_fake_quant_forward_close_to_int8_forward():
    """The STE fake-quant forward is the differentiable twin of the int8
    serving forward: same quantization decisions, f32 vs s32 arithmetic."""
    cfg = _micro_cfg()
    params, stats = _trained_like_variables(cfg)
    imgs = _images(cfg, n=2)
    plan, ptq = build_int8_layers(cfg, params, stats)
    _, student = qat_layers(cfg, params, stats)
    y_int8 = int8_forward(plan, ptq, jnp.asarray(imgs), cfg.grid.grid, "relu")
    y_fq = int8_forward(plan, student, jnp.asarray(imgs), cfg.grid.grid,
                        "relu")
    ref = float(jnp.max(jnp.abs(y_int8)))
    assert float(jnp.max(jnp.abs(y_fq - y_int8))) < 2e-2 * max(ref, 1.0)


def test_qat_finetune_reduces_distillation_loss():
    cfg = _micro_cfg()
    params, stats = _trained_like_variables(cfg)
    imgs = _images(cfg, n=8)
    plan, layers, info = qat_finetune(cfg, params, stats, imgs, steps=40,
                                      lr=1e-4, batch_size=4)
    # keep-best over full-set evals: never worse than the PTQ init
    assert info["best_loss"] <= info["first_loss"]
    assert info["best_step"] >= 0
    # frozen layers are true int8 serving layers
    assert any("w_q" in l for l in layers)
    y = int8_forward(plan, layers, jnp.asarray(imgs[:2]), cfg.grid.grid,
                     "relu")
    assert np.isfinite(np.asarray(y)).all()


def test_qat_with_static_scales_and_fpn_head():
    cfg = _micro_cfg(head="fpn", fpn_scales=2, activation="leaky_relu")
    g = dataclasses.replace(
        tiny_cpu_config().grid,
        anchors=((0.1, 0.15), (0.3, 0.3), (0.2, 0.4), (0.5, 0.5)))
    cfg = dataclasses.replace(cfg, grid=g)
    params, stats = _trained_like_variables(cfg)
    imgs = _images(cfg, n=4)
    scales = calibrate_activation_scales(cfg, params, stats, imgs[:2])
    plan, layers, info = qat_finetune(cfg, params, stats, imgs, steps=10,
                                      lr=1e-4, batch_size=4,
                                      act_scales=scales)
    assert info["best_loss"] <= info["first_loss"]  # keep-best guarantee
    outs = int8_forward(plan, layers, jnp.asarray(imgs[:2]), cfg.grid.grid,
                        "leaky_relu", head_activation="leaky_relu")
    assert isinstance(outs, tuple) and len(outs) == 2


def test_int8_inference_model_qat_surface():
    cfg = _micro_cfg()
    params, stats = _trained_like_variables(cfg)
    imgs = _images(cfg, n=4)
    m = Int8InferenceModel(cfg, params, stats, calib_images=imgs,
                           qat_steps=6, qat_batch=4)
    assert m.qat_info["steps"] == 6
    boxes, valid = m.predict(imgs[:2])
    assert boxes.shape[0] == 2 and valid.dtype == bool
    with pytest.raises(ValueError, match="mutually exclusive"):
        Int8InferenceModel(cfg, params, stats, calib_images=imgs,
                           qat_steps=2, bias_correct=True)
    with pytest.raises(ValueError, match="calib_images"):
        Int8InferenceModel(cfg, params, stats, qat_steps=2)
