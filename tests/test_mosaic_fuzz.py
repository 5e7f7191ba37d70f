"""Oracle-fuzz tests for mosaic/mixup box geometry: random boxes round-trip
through an independent numpy inversion of the documented affine. Sources are
identified by class id (class = source image index), so the tests hold
without knowing the internal permutation draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.data.augment import mixup_batch, mosaic_batch


def _rand_batch(rng, n_img, n_box, size):
    imgs = rng.randint(0, 256, (n_img, size, size, 3)).astype(np.uint8)
    boxes = np.zeros((n_img, n_box, 5), np.float32)
    valid = rng.uniform(size=(n_img, n_box)) < 0.7
    # centers away from edges, sizes comfortably above the sub-pixel filter
    boxes[..., 0] = rng.uniform(0.2, 0.8, (n_img, n_box))
    boxes[..., 1] = rng.uniform(0.2, 0.8, (n_img, n_box))
    boxes[..., 2] = rng.uniform(0.15, 0.3, (n_img, n_box))
    boxes[..., 3] = rng.uniform(0.15, 0.3, (n_img, n_box))
    boxes[..., 4] = np.arange(n_img)[:, None]  # class = source index
    boxes[~valid] = 0.0
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(valid)


@pytest.mark.parametrize("center", [0.3, 0.5, 0.62])
@pytest.mark.parametrize("seed", [0, 1])
def test_mosaic_boxes_invert_to_sources(center, seed):
    """Every surviving mosaic box, inverse-affined out of its quadrant,
    must coincide with a valid input box of the source its class names."""
    rng = np.random.RandomState(seed)
    size = 64
    imgs, boxes, valid = _rand_batch(rng, n_img=4, n_box=6, size=size)
    out_i, out_b, out_v = mosaic_batch(
        imgs, boxes, valid, jax.random.PRNGKey(seed), prob=1.0,
        center_range=(center, center))  # pin the center: geometry known
    out_b, out_v = np.asarray(out_b), np.asarray(out_v)
    src_boxes, src_valid = np.asarray(boxes), np.asarray(valid)

    cx = cy = center
    for b in range(4):
        kept = out_b[b][out_v[b]]
        assert len(kept) > 0
        for bx, by, bw, bh, cls in kept:
            right, bottom = bx >= cx, by >= cy
            qx0 = cx if right else 0.0
            qy0 = cy if bottom else 0.0
            qw = (1 - cx) if right else cx
            qh = (1 - cy) if bottom else cy
            inv = np.array([(bx - qx0) / qw, (by - qy0) / qh,
                            bw / qw, bh / qh])
            cand = src_boxes[int(cls)][src_valid[int(cls)]]
            dists = np.abs(cand[:, :4] - inv).max(axis=1)
            assert dists.min() < 1e-5, (b, cls, inv, cand)

        # image b itself is always source 0 (TL quadrant): all its valid
        # input boxes big enough after scaling must appear
        own = src_boxes[b][src_valid[b]]
        q0w, q0h = cx, cy
        expected = own[(own[:, 2] * q0w > 1.0 / size)
                       & (own[:, 3] * q0h > 1.0 / size)]
        own_out = kept[kept[:, 4] == b] if len(kept) else np.zeros((0, 5))
        assert len(own_out) >= len(expected)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mixup_box_union_exact(seed):
    """Mixup never moves a box: the union's rows are exact copies of input
    rows, own boxes in slots [:N] and the partner's in [N:], and every
    partner box's class names a single consistent source."""
    rng = np.random.RandomState(100 + seed)
    imgs, boxes, valid = _rand_batch(rng, n_img=6, n_box=4, size=32)
    out_i, out_b, out_v = mixup_batch(imgs, boxes, valid,
                                      jax.random.PRNGKey(seed), prob=1.0)
    out_b, out_v = np.asarray(out_b), np.asarray(out_v)
    src_boxes, src_valid = np.asarray(boxes), np.asarray(valid)

    for b in range(6):
        np.testing.assert_array_equal(out_b[b, :4][out_v[b, :4]],
                                      src_boxes[b][src_valid[b]])
        partner_rows = out_b[b, 4:][out_v[b, 4:]]
        if len(partner_rows) == 0:
            continue
        partners = set(int(c) for c in partner_rows[:, 4])
        assert len(partners) == 1  # one partner image per mixup
        s = partners.pop()
        np.testing.assert_array_equal(partner_rows,
                                      src_boxes[s][src_valid[s]])
