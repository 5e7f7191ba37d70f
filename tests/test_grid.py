"""Tests for core.grid: decode parity vs executed reference goldens
(ref utils.py:152-277) and encode semantics vs ref dataset.py:88-112,
including the encode->decode round-trip the reference uses as its de-facto
correctness check (ref dataset.py:150-153)."""

import numpy as np
import jax.numpy as jnp

from keras_object_detection_tpu.core.grid import decode_grid, encode_grid


def test_decode_matches_reference_goldens(goldens):
    for case in goldens["decode"]:
        pred = jnp.asarray(case["pred"], dtype=jnp.float32)
        got = np.asarray(
            decode_grid(pred, case["num_classes"], case["num_boxes"]))
        expected = np.asarray(case["decoded"], dtype=np.float32)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def _encode_oracle(boxes, num_classes, num_boxes, grid):
    """Independent numpy oracle for the reference's _get_labels semantics
    (first-box-wins, cell offsets; ref dataset.py:88-112)."""
    depth = num_classes + 5 * num_boxes
    out = np.zeros((grid, grid, depth), np.float32)
    for cx, cy, w, h, cls in boxes:
        i, j = int(grid * cy), int(grid * cx)
        y, x = grid * cy - i, grid * cx - j
        if out[i, j, num_classes] == 0:
            out[i, j, int(cls)] = 1
            out[i, j, num_classes + 1 : num_classes + 5] = [x, y, w, h]
            out[i, j, num_classes] = 1
    return out


def test_encode_fixture_matches_oracle(fixture_boxes):
    got = np.asarray(
        encode_grid(jnp.asarray(fixture_boxes), jnp.ones(len(fixture_boxes), bool),
                    num_classes=3, num_boxes=2, grid=7))
    expected = _encode_oracle(fixture_boxes, 3, 2, 7)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_encode_first_box_wins():
    # Two boxes in the same cell: the first row claims it (ref dataset.py:107).
    boxes = np.array(
        [[0.51, 0.52, 0.2, 0.2, 1.0], [0.52, 0.53, 0.3, 0.3, 2.0]], np.float32)
    got = np.asarray(
        encode_grid(jnp.asarray(boxes), jnp.ones(2, bool), 3, 2, 7))
    expected = _encode_oracle(boxes, 3, 2, 7)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    assert got[3, 3, 1] == 1.0 and got[3, 3, 2] == 0.0


def test_encode_respects_valid_mask():
    boxes = np.array(
        [[0.51, 0.52, 0.2, 0.2, 1.0], [0.1, 0.1, 0.1, 0.1, 0.0]], np.float32)
    got = np.asarray(
        encode_grid(jnp.asarray(boxes), jnp.asarray([False, True]), 3, 2, 7))
    assert got[3, 3].sum() == 0.0  # masked box contributed nothing
    assert got[0, 0, 3] == 1.0  # valid box encoded


def test_encode_random_matches_oracle():
    rng = np.random.RandomState(7)
    for _ in range(5):
        n = 12
        boxes = np.concatenate(
            [rng.uniform(0.02, 0.97, size=(n, 2)),
             rng.uniform(0.05, 0.5, size=(n, 2)),
             rng.randint(0, 20, size=(n, 1)).astype(np.float32)], axis=1
        ).astype(np.float32)
        valid = rng.uniform(size=n) < 0.8
        got = np.asarray(
            encode_grid(jnp.asarray(boxes), jnp.asarray(valid), 20, 2, 7))
        expected = _encode_oracle(boxes[valid], 20, 2, 7)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip(fixture_boxes):
    """The reference's visual self-test as a real unit test: encode labels,
    decode the grid, recover the original boxes (ref dataset.py:150-153)."""
    grid = encode_grid(jnp.asarray(fixture_boxes), jnp.ones(len(fixture_boxes), bool),
                       3, 2, 7)
    decoded = np.asarray(decode_grid(grid[None], 3, 2, 7))[0]  # (49, 6)
    conf = decoded[:, 1]
    recovered = decoded[conf > 0.5]
    assert len(recovered) == len(fixture_boxes)
    # order by class id to align
    recovered = recovered[np.argsort(recovered[:, 0])]
    orig = fixture_boxes[np.argsort(fixture_boxes[:, 4])]
    np.testing.assert_allclose(recovered[:, 0], orig[:, 4], atol=1e-6)
    np.testing.assert_allclose(recovered[:, 2:6], orig[:, :4], rtol=1e-4, atol=1e-5)


def test_encode_decode_grid14_roundtrip(fixture_boxes):
    """Generality beyond S=7: encode/decode round-trip at grid 14."""
    grid = encode_grid(jnp.asarray(fixture_boxes),
                       jnp.ones(len(fixture_boxes), bool), 3, 2, grid=14)
    assert grid.shape == (14, 14, 13)
    decoded = np.asarray(decode_grid(grid[None], 3, 2, grid=14))[0]
    recovered = decoded[decoded[:, 1] > 0.5]
    assert len(recovered) == len(fixture_boxes)
    recovered = recovered[np.argsort(recovered[:, 0])]
    orig = fixture_boxes[np.argsort(fixture_boxes[:, 4])]
    np.testing.assert_allclose(recovered[:, 2:6], orig[:, :4], rtol=1e-4,
                               atol=1e-5)
