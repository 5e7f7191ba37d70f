"""COCO-format -> YOLO-format dataset converter.

Companion to ``tools/voc_to_yolo.py``: the reference trains only on
VOC-style jpg+txt pairs (ref train.py:63-65); this widens ingestion to COCO
instance-annotation JSON (``images``/``annotations``/``categories``), the
other dominant detection interchange format. Output is the exact
``class_id cx cy w h`` sibling-txt layout ``data.reader`` consumes
(ref dataset.py:114-123 column semantics) plus a ``.names`` file.

Usage:
    python tools/coco_to_yolo.py --annotations instances_train2017.json \
        --image-dir train2017/ --out data/coco/train [--link]

Conversion math: COCO boxes are absolute ``[x_top_left, y_top_left, w, h]``
pixels; YOLO wants center/size ratios of the full image:
    cx = (x + w/2) / W    w_ratio = w / W

Category ids in COCO are sparse (1..90 with holes); class ids here are the
DENSE index into the sorted category-id list, so ``.names`` line N is
class N — the same invariant the VOC converter and visualization code use.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict, List, Tuple


def convert_coco(
    annotations_path: str,
    image_dir: str,
    out_dir: str,
    link: bool = False,
    keep_crowd: bool = False,
    skip_empty: bool = True,
) -> Tuple[int, List[str]]:
    """Convert one COCO instance-annotation JSON into a jpg+txt directory.

    ``keep_crowd``: keep ``iscrowd=1`` regions (COCO evaluation ignores
    them; training on them is the non-default arm, mirroring VOC's
    ``difficult`` handling). ``skip_empty`` drops images with no usable
    boxes. Returns ``(images written, class names)``; also writes
    ``coco.names``.
    """
    with open(annotations_path) as f:
        coco = json.load(f)

    categories = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_to_class: Dict[int, int] = {
        c["id"]: i for i, c in enumerate(categories)}
    names = [c["name"] for c in categories]

    images: Dict[int, dict] = {im["id"]: im for im in coco.get("images", [])}
    rows_by_image: Dict[int, list] = {}
    for ann in coco.get("annotations", []):
        if not keep_crowd and ann.get("iscrowd", 0):
            continue
        im = images.get(ann["image_id"])
        if im is None or ann["category_id"] not in cat_to_class:
            continue
        x, y, w, h = ann["bbox"]
        if w <= 0 or h <= 0:
            continue
        width, height = float(im["width"]), float(im["height"])
        cx = (x + w / 2.0) / width
        cy = (y + h / 2.0) / height
        rows_by_image.setdefault(ann["image_id"], []).append((
            cat_to_class[ann["category_id"]],
            min(max(cx, 0.0), 1.0), min(max(cy, 0.0), 1.0),
            min(w / width, 1.0), min(h / height, 1.0)))

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for image_id, im in sorted(images.items()):
        rows = rows_by_image.get(image_id, [])
        if skip_empty and not rows:
            continue
        src = os.path.join(image_dir, im["file_name"])
        if not os.path.exists(src):
            continue
        stem = os.path.splitext(os.path.basename(im["file_name"]))[0]
        dst = os.path.join(out_dir, stem + ".jpg")
        if link:
            try:
                if not os.path.exists(dst):
                    os.link(src, dst)
            except OSError:
                shutil.copyfile(src, dst)
        else:
            shutil.copyfile(src, dst)
        with open(os.path.join(out_dir, stem + ".txt"), "w") as f:
            for cid, cx, cy, w, h in rows:
                f.write(f"{cid} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
        written += 1

    with open(os.path.join(out_dir, "coco.names"), "w") as f:
        f.write("\n".join(names) + "\n")
    return written, names


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--annotations", required=True,
                   help="COCO instances JSON (e.g. instances_train2017.json)")
    p.add_argument("--image-dir", required=True,
                   help="directory holding the referenced image files")
    p.add_argument("--out", required=True, help="output jpg+txt directory")
    p.add_argument("--link", action="store_true",
                   help="hardlink images instead of copying")
    p.add_argument("--keep-crowd", action="store_true",
                   help="keep iscrowd=1 regions")
    args = p.parse_args()

    n, names = convert_coco(args.annotations, args.image_dir, args.out,
                            link=args.link, keep_crowd=args.keep_crowd)
    print(f"wrote {n} images -> {args.out} "
          f"(+ coco.names, {len(names)} classes)")


if __name__ == "__main__":
    main()
