"""Detection mixup (beyond parity — the reference has no mixup;
arXiv:1902.04103 §3.1 box-union variant): blend arithmetic, box union,
pass-through arm, and train-step integration composing with mosaic."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, TrainConfig,
)
from keras_object_detection_tpu.data.augment import mixup_batch
from keras_object_detection_tpu.train.loop import (
    create_train_state, make_train_step,
)


def _batch(n=4, size=16):
    imgs = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        imgs[i] = (i + 1) * 25  # distinct solid levels: 25, 50, ...
    boxes = np.zeros((n, 2, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.4, 0.0]
    boxes[:, 0, 4] = np.arange(n)
    valid = np.zeros((n, 2), bool)
    valid[:, 0] = True
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(valid)


def test_mixup_blend_and_union():
    imgs, boxes, valid = _batch()
    out_i, out_b, out_v = mixup_batch(imgs, boxes, valid,
                                      jax.random.PRNGKey(0), prob=1.0)
    out_i, out_b, out_v = map(np.asarray, (out_i, out_b, out_v))
    assert out_i.shape == (4, 16, 16, 3)
    assert out_b.shape == (4, 4, 5) and out_v.shape == (4, 4)

    src = np.asarray(imgs).astype(np.float64)
    levels = sorted(int(s[0, 0, 0]) for s in src)
    for b in range(4):
        px = float(out_i[b, 8, 8, 0])
        # blended pixel is a convex combination of two source levels with
        # λ ∈ [0.5, 1]: must lie within [min, max] of the palette
        assert levels[0] - 1 <= px <= levels[-1] + 1
        # primary dominates (λ >= 0.5): px = λ·own + (1-λ)·partner implies
        # |px - own| = (1-λ)|own - partner| <= max|own - partner| / 2
        own = src[b, 8, 8, 0]
        partners = [s[8, 8, 0] for s in src]
        assert abs(px - own) <= max(abs(own - p) for p in partners) / 2 + 1

        # box union: slot 0 = own box (always valid), slots 2.. = partner's
        assert out_v[b, 0]
        np.testing.assert_allclose(out_b[b, 0, :4], [0.5, 0.5, 0.4, 0.4])
        assert out_b[b, 0, 4] == b  # own class survives in place
        # exactly 2 valid boxes total (own + one partner box)
        assert out_v[b].sum() == 2


def test_mixup_prob_zero_is_passthrough():
    imgs, boxes, valid = _batch()
    out_i, out_b, out_v = mixup_batch(imgs, boxes, valid,
                                      jax.random.PRNGKey(1), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out_b[:, :2]), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(out_v[:, :2]), np.asarray(valid))
    assert not np.asarray(out_v[:, 2:]).any()


def test_mixup_lambda_in_half_open_range():
    """The folded Beta draw keeps λ in [0.5, 1]: the blended image is always
    at least half its own pixel values (checked via solid-color levels)."""
    imgs, boxes, valid = _batch(n=8)
    out_i, _, _ = mixup_batch(imgs, boxes, valid, jax.random.PRNGKey(2),
                              prob=1.0, alpha=0.5)
    src = np.asarray(imgs).astype(np.float64)
    for b in range(8):
        px = float(np.asarray(out_i)[b, 8, 8, 0])
        own = src[b, 8, 8, 0]
        others = [src[j, 8, 8, 0] for j in range(8)]
        # px = λ·own + (1-λ)·partner with λ >= 0.5 means
        # |px - own| <= |own - partner| / 2 for the realized partner
        assert any(abs(px - (0.5 * own + 0.5 * o)) <= abs(own - o) / 2 + 1
                   for o in others)


def test_train_step_with_mosaic_and_mixup():
    """Mosaic (4N) then mixup (8N) compose inside the jitted step."""
    cfg = Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=4, max_boxes_per_image=8,
                        mosaic_prob=0.5, mixup_prob=0.5),
        train=TrainConfig(optimizer="adam"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 56, 56, 3), dtype=np.uint8))
    boxes = np.zeros((4, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.3, 1.0]
    valid = np.zeros((4, 8), bool)
    valid[:, 0] = True
    new_state, metrics = step(state, imgs, jnp.asarray(boxes),
                              jnp.asarray(valid), jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
