"""VOC->YOLO converter: XML parsing math, split/difficult handling, and an
end-to-end round-trip through the real YoloDataset pipeline (the standing
'wire VOC-2007 the moment data lands' path — ref train.py:63-65 consumes
exactly the converter's output layout)."""

import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from voc_to_yolo import convert_voc, parse_voc_xml  # noqa: E402

from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.data.reader import read_yolo_labels

FIXTURE_JPG = "/root/reference/yolo_v1/data/test.jpg"

XML = """<annotation>
  <filename>{fid}.jpg</filename>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  {objects}
</annotation>"""

OBJ = """<object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{xmin}</xmin><ymin>{ymin}</ymin>
            <xmax>{xmax}</xmax><ymax>{ymax}</ymax></bndbox>
  </object>"""


def _make_voc_tree(root, annotations):
    """annotations: {image_id: [(name, difficult, xmin, ymin, xmax, ymax)]}"""
    ann = root / "Annotations"
    img = root / "JPEGImages"
    sets = root / "ImageSets" / "Main"
    for d in (ann, img, sets):
        d.mkdir(parents=True, exist_ok=True)
    for fid, objs in annotations.items():
        body = "".join(
            OBJ.format(name=n, difficult=d, xmin=x0, ymin=y0, xmax=x1, ymax=y1)
            for n, d, x0, y0, x1, y1 in objs)
        (ann / f"{fid}.xml").write_text(XML.format(fid=fid, objects=body))
        shutil.copy(FIXTURE_JPG, img / f"{fid}.jpg")
    return root


def test_parse_voc_xml_box_math(tmp_path):
    root = _make_voc_tree(tmp_path, {
        "im0": [("dog", 0, 50, 25, 150, 75), ("cat", 0, 0, 0, 200, 100)]})
    fname, rows = parse_voc_xml(
        str(tmp_path / "Annotations" / "im0.xml"), {"dog": 0, "cat": 1})
    assert fname == "im0.jpg"
    # dog: center (100, 50) of a 200x100 image -> (0.5, 0.5); size 100x50 ->
    # (0.5, 0.5)
    assert rows[0] == (0, 0.5, 0.5, 0.5, 0.5)
    # cat: full image
    assert rows[1] == (1, 0.5, 0.5, 1.0, 1.0)


def test_difficult_and_unknown_filtered(tmp_path):
    _make_voc_tree(tmp_path, {
        "im0": [("dog", 1, 50, 25, 150, 75),      # difficult -> dropped
                ("unicorn", 0, 10, 10, 90, 90),   # unknown class -> dropped
                ("cat", 0, 20, 20, 80, 80)]})
    _, rows = parse_voc_xml(
        str(tmp_path / "Annotations" / "im0.xml"), {"dog": 0, "cat": 1})
    assert [r[0] for r in rows] == [1]
    _, rows_kd = parse_voc_xml(
        str(tmp_path / "Annotations" / "im0.xml"), {"dog": 0, "cat": 1},
        keep_difficult=True)
    assert [r[0] for r in rows_kd] == [0, 1]


def test_convert_split_and_roundtrip(tmp_path):
    root = _make_voc_tree(tmp_path / "voc", {
        "im0": [("dog", 0, 50, 25, 150, 75)],
        "im1": [("cat", 0, 20, 10, 180, 90), ("dog", 0, 100, 50, 200, 100)],
        "im2": [("dog", 1, 50, 25, 150, 75)],   # only difficult -> skipped
    })
    (root / "ImageSets" / "Main" / "train.txt").write_text("im0\nim1\nim2\n")
    out = tmp_path / "out"
    n = convert_voc(str(root), str(out), split="train",
                    classes=("dog", "cat"))
    assert n == 2
    assert sorted(os.listdir(out)) == [
        "im0.jpg", "im0.txt", "im1.jpg", "im1.txt", "voc.names"]
    assert (out / "voc.names").read_text() == "dog\ncat\n"

    # label files parse through the production reader with the exact column
    # order the pipeline expects ([cx, cy, w, h, class_id])
    rows = read_yolo_labels(str(out / "im1.txt"))
    assert rows.shape == (2, 5)
    np.testing.assert_allclose(rows[0], [0.5, 0.5, 0.8, 0.8, 1.0], atol=1e-5)
    np.testing.assert_allclose(rows[1], [0.75, 0.75, 0.5, 0.5, 0.0], atol=1e-5)

    # full pipeline round-trip: batches assemble with the converted boxes
    ds = YoloDataset(str(out), 224, batch_size=2, max_boxes=8, shuffle=False)
    images, boxes, valid = next(ds.epoch())
    assert images.shape == (2, 224, 224, 3)
    assert valid.sum() == 3  # 1 box in im0 + 2 in im1
    got = boxes[1][valid[1]]
    np.testing.assert_allclose(
        got[:, :4], [[0.5, 0.5, 0.8, 0.8], [0.75, 0.75, 0.5, 0.5]], atol=1e-5)


def test_convert_all_without_split(tmp_path):
    root = _make_voc_tree(tmp_path / "voc", {
        "a": [("dog", 0, 10, 10, 100, 60)],
        "b": [("dog", 0, 10, 10, 100, 60)],
    })
    out = tmp_path / "out"
    assert convert_voc(str(root), str(out), classes=("dog",), link=True) == 2
