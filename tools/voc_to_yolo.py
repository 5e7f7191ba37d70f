"""Pascal-VOC -> YOLO-format dataset converter.

The reference's only real workload is VOC-2007 pre-converted to YOLO txt
files (ref train.py:63-65 hardcodes ``.../voc2007/train`` directories of
jpg+txt pairs; the conversion itself is assumed done out-of-band). This tool
makes that step part of the framework: point it at a ``VOCdevkit/VOC2007``
tree and it emits the exact ``class_id cx cy w h`` sibling-txt layout that
``data.reader`` consumes (ref dataset.py:114-123 column semantics), plus a
``.names`` file for visualization/per-class reports.

Usage:
    python tools/voc_to_yolo.py --voc-dir VOCdevkit/VOC2007 \
        --split train --out data/voc2007/train [--link]

Conversion math: VOC ``bndbox`` is 1-based inclusive pixel corners
(xmin, ymin, xmax, ymax); YOLO wants center/size ratios of the full image:
    cx = (xmin + xmax) / 2 / W    w = (xmax - xmin) / W
(using the 0-based half-open extent, i.e. the raw corner difference —
the convention darknet's own voc_label.py established).
"""

from __future__ import annotations

import argparse
import os
import shutil
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Sequence, Tuple

# The canonical 20 VOC classes in darknet's voc.names order; used when the
# caller doesn't supply --names (order defines class ids, so it must be
# stable across train/val conversions).
VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def parse_voc_xml(
    xml_path: str,
    class_to_id: Dict[str, int],
    keep_difficult: bool = False,
) -> Tuple[str, List[Tuple[int, float, float, float, float]]]:
    """(image filename, [(class_id, cx, cy, w, h), ...]) from one annotation.

    Boxes of classes missing from ``class_to_id`` and (by default)
    ``difficult`` objects are skipped — difficult objects are excluded from
    VOC evaluation, and training on them is the non-default arm.
    """
    root = ET.parse(xml_path).getroot()
    filename = root.findtext("filename") or (
        os.path.splitext(os.path.basename(xml_path))[0] + ".jpg")
    size = root.find("size")
    width = float(size.findtext("width"))
    height = float(size.findtext("height"))
    rows = []
    for obj in root.iter("object"):
        name = (obj.findtext("name") or "").strip()
        if name not in class_to_id:
            continue
        if not keep_difficult and (obj.findtext("difficult") or "0").strip() == "1":
            continue
        box = obj.find("bndbox")
        xmin = float(box.findtext("xmin"))
        ymin = float(box.findtext("ymin"))
        xmax = float(box.findtext("xmax"))
        ymax = float(box.findtext("ymax"))
        cx = (xmin + xmax) / 2.0 / width
        cy = (ymin + ymax) / 2.0 / height
        w = (xmax - xmin) / width
        h = (ymax - ymin) / height
        # clamp boxes that poke past the image edge (present in real VOC)
        if w <= 0 or h <= 0:
            continue
        rows.append((class_to_id[name],
                     min(max(cx, 0.0), 1.0), min(max(cy, 0.0), 1.0),
                     min(w, 1.0), min(h, 1.0)))
    return filename, rows


def convert_voc(
    voc_dir: str,
    out_dir: str,
    split: Optional[str] = None,
    classes: Sequence[str] = VOC_CLASSES,
    link: bool = False,
    keep_difficult: bool = False,
    skip_empty: bool = True,
) -> int:
    """Convert a ``VOCdevkit/VOC<year>`` tree into a jpg+txt directory.

    ``split``: an ``ImageSets/Main/<split>.txt`` id list (``train``, ``val``,
    ``trainval``, ``test``); ``None`` converts every annotation present.
    ``link`` hardlinks images instead of copying (falls back to copy across
    filesystems). ``skip_empty`` drops images whose annotation yields no
    usable boxes (matches the loss's assumption of >=1 responsible cell).

    Returns the number of images written. Also writes ``voc.names``.
    """
    ann_dir = os.path.join(voc_dir, "Annotations")
    img_dir = os.path.join(voc_dir, "JPEGImages")
    class_to_id = {c: i for i, c in enumerate(classes)}

    if split is not None:
        ids_file = os.path.join(voc_dir, "ImageSets", "Main", split + ".txt")
        with open(ids_file) as f:
            ids = [line.split()[0] for line in f if line.strip()]
    else:
        ids = sorted(os.path.splitext(f)[0] for f in os.listdir(ann_dir)
                     if f.endswith(".xml"))

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for image_id in ids:
        xml_path = os.path.join(ann_dir, image_id + ".xml")
        if not os.path.exists(xml_path):
            continue
        filename, rows = parse_voc_xml(xml_path, class_to_id, keep_difficult)
        if skip_empty and not rows:
            continue
        src = os.path.join(img_dir, filename)
        if not os.path.exists(src):
            continue
        dst = os.path.join(out_dir, image_id + ".jpg")
        if link:
            try:
                if not os.path.exists(dst):
                    os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
        else:
            shutil.copyfile(src, dst)
        with open(os.path.join(out_dir, image_id + ".txt"), "w") as f:
            for cid, cx, cy, w, h in rows:
                f.write(f"{cid} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
        written += 1

    with open(os.path.join(out_dir, "voc.names"), "w") as f:
        f.write("\n".join(classes) + "\n")
    return written


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--voc-dir", required=True,
                   help="VOCdevkit/VOC<year> root (Annotations/ JPEGImages/)")
    p.add_argument("--out", required=True, help="output jpg+txt directory")
    p.add_argument("--split", default=None,
                   help="ImageSets/Main split name (train/val/trainval/test); "
                        "default: all annotated images")
    p.add_argument("--names", default=None,
                   help="class list file, one per line (default: the 20 "
                        "canonical VOC classes)")
    p.add_argument("--link", action="store_true",
                   help="hardlink images instead of copying")
    p.add_argument("--keep-difficult", action="store_true",
                   help="keep objects marked difficult=1")
    args = p.parse_args()

    classes: Sequence[str] = VOC_CLASSES
    if args.names:
        with open(args.names) as f:
            classes = [line.strip() for line in f if line.strip()]
    n = convert_voc(args.voc_dir, args.out, split=args.split, classes=classes,
                    link=args.link, keep_difficult=args.keep_difficult)
    print(f"wrote {n} images -> {args.out} "
          f"(+ voc.names, {len(classes)} classes)")


if __name__ == "__main__":
    main()
