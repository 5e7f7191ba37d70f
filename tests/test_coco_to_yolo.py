"""COCO->YOLO converter: bbox math, crowd filtering, sparse-category-id
densification, and a round-trip through the real YoloDataset pipeline
(companion to tools/voc_to_yolo.py; the reference only ingests VOC-style
jpg+txt, ref train.py:63-65)."""

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from coco_to_yolo import convert_coco  # noqa: E402

from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.data.reader import read_yolo_labels

FIXTURE_JPG = "/root/reference/yolo_v1/data/test.jpg"


def _make_coco(root, images, annotations, categories):
    (root / "imgs").mkdir(parents=True, exist_ok=True)
    for im in images:
        shutil.copy(FIXTURE_JPG, root / "imgs" / im["file_name"])
    ann = root / "instances.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": categories}))
    return str(ann), str(root / "imgs")


def test_coco_bbox_math_and_sparse_ids(tmp_path):
    # sparse COCO category ids (3, 17) densify to class ids (0, 1)
    ann, imgs = _make_coco(
        tmp_path,
        images=[{"id": 7, "file_name": "a.jpg", "width": 200, "height": 100}],
        annotations=[
            {"id": 1, "image_id": 7, "category_id": 17,
             "bbox": [50, 25, 100, 50], "iscrowd": 0},
            {"id": 2, "image_id": 7, "category_id": 3,
             "bbox": [0, 0, 200, 100], "iscrowd": 0},
        ],
        categories=[{"id": 17, "name": "dog"}, {"id": 3, "name": "cat"}])
    out = tmp_path / "out"
    n, names = convert_coco(ann, imgs, str(out))
    assert n == 1 and names == ["cat", "dog"]  # sorted by category id
    rows = read_yolo_labels(str(out / "a.txt"))
    # dog (class 1): top-left (50,25) size 100x50 in 200x100 -> center
    # (0.5, 0.5), size (0.5, 0.5); cat (class 0): full image
    want = {(1.0, 0.5, 0.5, 0.5, 0.5), (0.0, 0.5, 0.5, 1.0, 1.0)}
    got = {(r[4], round(r[0], 4), round(r[1], 4), round(r[2], 4),
            round(r[3], 4)) for r in rows}
    assert got == want
    assert (out / "coco.names").read_text() == "cat\ndog\n"


def test_coco_crowd_and_empty_filtering(tmp_path):
    ann, imgs = _make_coco(
        tmp_path,
        images=[
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 100},
            {"id": 2, "file_name": "b.jpg", "width": 100, "height": 100},
        ],
        annotations=[
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 50, 50], "iscrowd": 1},  # crowd -> dropped
            {"id": 2, "image_id": 2, "category_id": 1,
             "bbox": [10, 10, 50, 50], "iscrowd": 0},
        ],
        categories=[{"id": 1, "name": "person"}])
    out = tmp_path / "out"
    n, _ = convert_coco(ann, imgs, str(out))
    assert n == 1  # image 1 became empty and was skipped
    assert sorted(p for p in os.listdir(out) if p != "coco.names") == [
        "b.jpg", "b.txt"]
    n_kc, _ = convert_coco(ann, imgs, str(tmp_path / "out2"), keep_crowd=True)
    assert n_kc == 2


def test_coco_roundtrip_through_pipeline(tmp_path):
    ann, imgs = _make_coco(
        tmp_path,
        images=[{"id": 1, "file_name": "a.jpg", "width": 100, "height": 100},
                {"id": 2, "file_name": "b.jpg", "width": 100, "height": 100}],
        annotations=[
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [25, 25, 50, 50], "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 1,
             "bbox": [0, 0, 100, 50], "iscrowd": 0},
        ],
        categories=[{"id": 1, "name": "person"}])
    out = tmp_path / "out"
    convert_coco(ann, imgs, str(out))
    ds = YoloDataset(str(out), 224, batch_size=2, max_boxes=4, shuffle=False)
    images, boxes, valid = next(ds.epoch())
    assert images.shape == (2, 224, 224, 3)
    assert valid.sum() == 2
    np.testing.assert_allclose(boxes[0][valid[0]][0, :4],
                               [0.5, 0.5, 0.5, 0.5], atol=1e-5)
    np.testing.assert_allclose(boxes[1][valid[1]][0, :4],
                               [0.5, 0.25, 1.0, 0.5], atol=1e-5)
