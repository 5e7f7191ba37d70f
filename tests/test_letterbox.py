"""Letterbox input mode (beyond parity — the reference's square resize
distorts aspect, ref dataset.py:143-146): placement geometry, gray padding,
box remap + inverse round-trip, loader integration, and disk-cache
invalidation."""

import os
import shutil

import numpy as np
import pytest

from keras_object_detection_tpu.data.reader import (
    LETTERBOX_PAD, letterbox_boxes, letterbox_geometry, letterbox_image,
    load_example, unletterbox_detections,
)

FIXTURE = "/root/reference/yolo_v1/data"


def test_geometry_and_padding():
    nh, nw, py, px = letterbox_geometry(200, 400, 100)
    assert (nh, nw) == (50, 100) and (py, px) == (25, 0)

    img = np.full((200, 400, 3), 200, np.uint8)
    out = letterbox_image(img, 100)
    assert out.shape == (100, 100, 3)
    assert (out[:25] == LETTERBOX_PAD).all() and (out[75:] == LETTERBOX_PAD).all()
    assert (out[25:75] == 200).all()

    # square input: identity placement, no padding
    nh, nw, py, px = letterbox_geometry(64, 64, 100)
    assert (nh, nw, py, px) == (100, 100, 0, 0)


def test_box_roundtrip_inverse():
    h, w, s = 300, 500, 224
    rng = np.random.RandomState(0)
    boxes = np.zeros((8, 5), np.float32)
    boxes[:, 0] = rng.uniform(0.2, 0.8, 8)
    boxes[:, 1] = rng.uniform(0.2, 0.8, 8)
    boxes[:, 2] = rng.uniform(0.1, 0.3, 8)
    boxes[:, 3] = rng.uniform(0.1, 0.3, 8)
    boxes[:, 4] = rng.randint(0, 3, 8)

    lb = letterbox_boxes(boxes, h, w, s)
    # letterboxed boxes live inside the content region
    nh, nw, py, px = letterbox_geometry(h, w, s)
    assert (lb[:, 1] * s >= py - 1e-3).all()
    assert (lb[:, 1] * s <= py + nh + 1e-3).all()

    # inverse on the serving layout recovers the original ratios
    dets = np.concatenate(
        [lb[:, 4:5], np.ones((8, 1), np.float32), lb[:, :4]], axis=-1)
    rec = unletterbox_detections(dets, h, w, s)
    np.testing.assert_allclose(rec[:, 2:], boxes[:, :4], atol=1e-6)


def test_load_example_letterbox_fixture():
    """The reference fixture jpg is non-square: letterbox decode pads it,
    and the remapped boxes match the manual oracle from the raw labels."""
    import cv2

    from keras_object_detection_tpu.data.reader import read_yolo_labels

    jpg = os.path.join(FIXTURE, "test.jpg")
    raw_img = cv2.imread(jpg)
    h, w = raw_img.shape[:2]
    assert h != w, "fixture is square; test needs a non-square image"

    img, boxes, valid = load_example(jpg, 224, 8, letterbox=True)
    assert img.shape == (224, 224, 3)
    nh, nw, py, px = letterbox_geometry(h, w, 224)
    # padding bands are gray
    if py:
        assert (img[:py] == LETTERBOX_PAD).all()
    if px:
        assert (img[:, :px] == LETTERBOX_PAD).all()

    raw = read_yolo_labels(os.path.join(FIXTURE, "test.txt"))
    expect = letterbox_boxes(raw, h, w, 224)
    np.testing.assert_allclose(boxes[valid], expect[:valid.sum()], atol=1e-6)


def test_dataset_and_disk_cache_letterbox(tmp_path):
    from keras_object_detection_tpu.data.pipeline import YoloDataset

    data = tmp_path / "d"
    data.mkdir()
    shutil.copy(os.path.join(FIXTURE, "test.jpg"), data / "a.jpg")
    shutil.copy(os.path.join(FIXTURE, "test.txt"), data / "a.txt")

    ds = YoloDataset(str(data), 224, 1, max_boxes=8, letterbox=True)
    images, boxes, valid = next(ds.epoch())
    ref_img, ref_boxes, ref_valid = load_example(
        str(data / "a.jpg"), 224, 8, letterbox=True)
    np.testing.assert_array_equal(images[0], ref_img)
    np.testing.assert_array_equal(boxes[0], ref_boxes)

    # disk cache: letterbox is part of the validity key — flipping it
    # rebuilds rather than serving stale square-resize bytes
    cache = str(tmp_path / "cache")
    ds_sq = YoloDataset(str(data), 224, 1, max_boxes=8, cache_dir=cache)
    sq_img = next(ds_sq.epoch())[0][0]
    ds_lb = YoloDataset(str(data), 224, 1, max_boxes=8, cache_dir=cache,
                        letterbox=True)
    lb_img = next(ds_lb.epoch())[0][0]
    assert not np.array_equal(sq_img, lb_img)
    np.testing.assert_array_equal(lb_img, ref_img)
