"""Pallas fused loss parity: value AND gradient vs jax.grad of the jnp loss
(which is itself golden-tested against the executed reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.losses.yolo import yolo_v1_loss
from keras_object_detection_tpu.ops.pallas_loss import pallas_yolo_v1_loss


def _random_case(seed, batch=2, c=3, b=2, obj_prob=0.3):
    rng = np.random.RandomState(seed)
    depth = c + 5 * b
    y_true = np.zeros((batch, 7, 7, depth), np.float32)
    for bi in range(batch):
        for i in range(7):
            for j in range(7):
                if rng.uniform() < obj_prob:
                    cls = rng.randint(c)
                    y_true[bi, i, j, cls] = 1
                    y_true[bi, i, j, c] = 1
                    y_true[bi, i, j, c + 1 : c + 5] = rng.uniform(
                        [0, 0, 0.02, 0.02], [1, 1, 0.6, 0.6])
    y_pred = rng.uniform(-0.3, 1.0, size=y_true.shape).astype(np.float32)
    return jnp.asarray(y_true), jnp.asarray(y_pred)


@pytest.mark.parametrize("noobj_mode", ["selected", "all"])
def test_pallas_loss_value_parity(noobj_mode):
    for seed in range(3):
        y_true, y_pred = _random_case(seed)
        got = float(pallas_yolo_v1_loss(y_true, y_pred, 3, 2,
                                        noobj_mode=noobj_mode, interpret=True))
        want = float(yolo_v1_loss(y_true, y_pred, 3, 2, noobj_mode=noobj_mode))
        assert np.isclose(got, want, rtol=1e-5), (got, want)


def test_pallas_loss_value_parity_voc_shapes():
    y_true, y_pred = _random_case(7, batch=2, c=20, b=2)
    got = float(pallas_yolo_v1_loss(y_true, y_pred, 20, 2, interpret=True))
    want = float(yolo_v1_loss(y_true, y_pred, 20, 2))
    assert np.isclose(got, want, rtol=1e-5)


def test_pallas_loss_three_slots():
    y_true, y_pred = _random_case(9, batch=1, c=5, b=3)
    got = float(pallas_yolo_v1_loss(y_true, y_pred, 5, 3, interpret=True))
    want = float(yolo_v1_loss(y_true, y_pred, 5, 3))
    assert np.isclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("noobj_mode", ["selected", "all"])
def test_pallas_loss_gradient_parity(noobj_mode):
    for seed in range(3):
        y_true, y_pred = _random_case(seed + 20)
        g_pallas = jax.grad(
            lambda p: pallas_yolo_v1_loss(y_true, p, 3, 2,
                                          noobj_mode=noobj_mode,
                                          interpret=True))(y_pred)
        g_jnp = jax.grad(
            lambda p: yolo_v1_loss(y_true, p, 3, 2, noobj_mode=noobj_mode))(
                y_pred)
        np.testing.assert_allclose(
            np.asarray(g_pallas), np.asarray(g_jnp), rtol=1e-4, atol=1e-5)


def test_pallas_loss_gradient_edge_wh():
    """Gradients at the sign/abs/sqrt kinks: zero and negative w/h."""
    y_true, y_pred = _random_case(31)
    y_pred = y_pred.at[0, 1, 1, 6:8].set(jnp.asarray([0.0, -0.4]))
    g_pallas = jax.grad(
        lambda p: pallas_yolo_v1_loss(y_true, p, 3, 2, interpret=True))(y_pred)
    g_jnp = jax.grad(lambda p: yolo_v1_loss(y_true, p, 3, 2))(y_pred)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_jnp), rtol=1e-4, atol=1e-5)


def test_pallas_loss_smoke_golden(goldens):
    """Against the executed-reference loss goldens directly."""
    for case in goldens["loss"][:2]:
        y_true = jnp.asarray(case["y_true"], dtype=jnp.float32)
        y_pred = jnp.asarray(case["y_pred"], dtype=jnp.float32)
        got = float(pallas_yolo_v1_loss(
            y_true, y_pred, case["num_classes"], case["num_boxes"],
            interpret=True))
        assert np.isclose(got, case["loss"], rtol=1e-4)
