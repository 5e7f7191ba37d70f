"""Loss parity vs the executed reference YoloV1Loss (ref loss.py:100-215),
including the exact smoke tensors from ref loss.py:218-237, plus gradient
sanity (the reference trains through sign/sqrt/abs at w,h <= 0)."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.losses import YoloV1Loss, yolo_v1_loss, yolo_v1_loss_terms


def test_loss_matches_reference_goldens(goldens):
    for case in goldens["loss"]:
        y_true = jnp.asarray(case["y_true"], dtype=jnp.float32)
        y_pred = jnp.asarray(case["y_pred"], dtype=jnp.float32)
        got = float(yolo_v1_loss(y_true, y_pred, case["num_classes"],
                                 case["num_boxes"]))
        assert np.isclose(got, case["loss"], rtol=1e-4), (
            f"loss mismatch: got {got}, want {case['loss']}")


def test_loss_class_surface(goldens):
    case = goldens["loss"][0]
    loss = YoloV1Loss(num_classes=case["num_classes"], num_boxes=case["num_boxes"])
    got = float(loss(jnp.asarray(case["y_true"]), jnp.asarray(case["y_pred"])))
    assert np.isclose(got, case["loss"], rtol=1e-4)


def test_loss_terms_sum_to_total():
    rng = np.random.RandomState(1)
    y_true = jnp.asarray(rng.uniform(0, 1, (2, 7, 7, 13)), dtype=jnp.float32)
    y_pred = jnp.asarray(rng.uniform(-0.5, 1, (2, 7, 7, 13)), dtype=jnp.float32)
    terms = yolo_v1_loss_terms(y_true, y_pred, 3, 2)
    total = (5.0 * terms["box_loss"] + terms["object_loss"]
             + 0.5 * terms["no_object_loss"] + terms["class_loss"])
    np.testing.assert_allclose(float(total), float(terms["total"]), rtol=1e-6)


def test_loss_zero_when_perfect():
    # A target compared against itself: xy/class/noobj terms vanish; the
    # object term becomes (iou - conf)^2 = (1 - 1)^2 = 0; wh term only
    # differs by the sqrt epsilon.
    y = np.zeros((1, 7, 7, 13), np.float32)
    y[:, 2, 2, 0] = 1
    y[:, 2, 2, 3] = 1
    y[:, 2, 2, 4:8] = [0.5, 0.5, 0.2, 0.2]
    val = float(yolo_v1_loss(jnp.asarray(y), jnp.asarray(y), 3, 2))
    assert val < 1e-4


def test_loss_gradients_finite():
    rng = np.random.RandomState(2)
    y_true = np.zeros((2, 7, 7, 13), np.float32)
    # objects present and absent; include zero and negative predicted w/h
    y_true[:, 1, 1, 2] = 1
    y_true[:, 1, 1, 3] = 1
    y_true[:, 1, 1, 4:8] = [0.5, 0.5, 0.1, 0.1]
    y_pred = rng.uniform(-0.5, 1.0, size=(2, 7, 7, 13)).astype(np.float32)
    y_pred[:, 1, 1, 6:8] = [0.0, -0.3]  # exercise sign/sqrt/abs at w,h <= 0

    grad = jax.grad(
        lambda p: yolo_v1_loss(jnp.asarray(y_true), p, 3, 2))(jnp.asarray(y_pred))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_loss_jit_compiles():
    y = jnp.zeros((1, 7, 7, 13), dtype=jnp.float32)
    fn = jax.jit(lambda t, p: yolo_v1_loss(t, p, 3, 2))
    assert np.isfinite(float(fn(y, y)))


def test_diou_box_loss_mode():
    """Opt-in DIoU regression (PAPERS.md, arXiv:1911.08287): zero for a
    perfect box, positive and finite-gradient otherwise."""
    y = np.zeros((1, 7, 7, 13), np.float32)
    y[:, 2, 2, 0] = 1
    y[:, 2, 2, 3] = 1
    y[:, 2, 2, 4:8] = [0.5, 0.5, 0.2, 0.2]
    terms_perfect = yolo_v1_loss_terms(
        jnp.asarray(y), jnp.asarray(y), 3, 2, box_loss_mode="diou")
    assert float(terms_perfect["box_loss"]) < 1e-5

    y_bad = y.copy()
    y_bad[:, 2, 2, 4:8] = [0.2, 0.8, 0.05, 0.05]
    terms_bad = yolo_v1_loss_terms(
        jnp.asarray(y), jnp.asarray(y_bad), 3, 2, box_loss_mode="diou")
    assert float(terms_bad["box_loss"]) > 0.5

    g = jax.grad(lambda p: yolo_v1_loss_terms(
        jnp.asarray(y), p, 3, 2, box_loss_mode="diou")["total"])(
            jnp.asarray(y_bad))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ciou_and_alpha_iou_box_loss_modes():
    """CIoU / alpha-DIoU (PAPERS.md, arXiv:1911.08287 / 2110.13675): zero
    for a perfect box, positive + finite-gradient otherwise, and ordered
    sensibly vs DIoU (CIoU >= DIoU: it adds a non-negative aspect term)."""
    y = np.zeros((1, 7, 7, 13), np.float32)
    y[:, 2, 2, 0] = 1
    y[:, 2, 2, 3] = 1
    y[:, 2, 2, 4:8] = [0.5, 0.5, 0.2, 0.2]
    y_bad = y.copy()
    y_bad[:, 2, 2, 4:8] = [0.4, 0.6, 0.05, 0.3]  # off-center + wrong aspect

    vals = {}
    for mode in ("diou", "ciou", "alpha_iou"):
        perfect = yolo_v1_loss_terms(
            jnp.asarray(y), jnp.asarray(y), 3, 2, box_loss_mode=mode)
        assert float(perfect["box_loss"]) < 1e-5, mode
        bad = yolo_v1_loss_terms(
            jnp.asarray(y), jnp.asarray(y_bad), 3, 2, box_loss_mode=mode)
        vals[mode] = float(bad["box_loss"])
        assert vals[mode] > 0.1, (mode, vals[mode])
        g = jax.grad(lambda p: yolo_v1_loss_terms(
            jnp.asarray(y), p, 3, 2, box_loss_mode=mode)["total"])(
                jnp.asarray(y_bad))
        assert np.all(np.isfinite(np.asarray(g))), mode
    assert vals["ciou"] >= vals["diou"] - 1e-6


def test_pallas_loss_rejects_iou_box_modes(tmp_path):
    """use_pallas_loss implements only the MSE box terms; combining it with
    an IoU-family box_loss_mode must fail loudly, not silently train MSE."""
    import dataclasses

    import pytest

    from keras_object_detection_tpu.config import (
        Config, DataConfig, GridConfig, ModelConfig, TrainConfig)
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=4),
        train=TrainConfig(optimizer="adam", use_pallas_loss=True,
                          box_loss_mode="ciou"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    imgs = jnp.zeros((2, 56, 56, 3), jnp.uint8)
    boxes = jnp.zeros((2, 4, 5), jnp.float32)
    valid = jnp.zeros((2, 4), bool)
    with pytest.raises(ValueError, match="jnp loss path"):
        step(state, imgs, boxes, valid, jax.random.PRNGKey(1))
