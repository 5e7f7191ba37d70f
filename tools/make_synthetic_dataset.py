#!/usr/bin/env python
"""Generate a multi-class synthetic detection dataset in YOLO format
(images + ``<stem>.txt`` with ``class cx cy w h`` lines).

Fills the role the reference's VOC runs played (ref train_info.txt) in this
zero-egress container: a dataset large and varied enough to prove the full
pipeline learns beyond toy sizes. Classes are shape x color combinations
(4 shapes x 5 colors = 20 classes by default, matching VOC's C=20); object
sizes, counts, positions, background textures, and mild occlusion are all
randomized.

Usage:
  python tools/make_synthetic_dataset.py --out /tmp/synth --train 400 \
      --val 80 --num-classes 20 --image-size 224 --seed 0
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

COLORS = [
    (225, 50, 50),    # red
    (50, 205, 50),    # green
    (60, 80, 230),    # blue
    (235, 210, 40),   # yellow
    (190, 60, 200),   # magenta
]
SHAPES = ["rect", "circle", "triangle", "ellipse"]


def class_name(cls: int) -> str:
    return f"{SHAPES[cls % len(SHAPES)]}_{cls // len(SHAPES)}"


def _draw_shape(img, cls, cx, cy, w, h, rng):
    """Draw class ``cls`` (shape = cls % 4, color = cls // 4) into img."""
    size = img.shape[0]
    color = tuple(int(c + rng.randint(-25, 26)) for c in COLORS[cls // len(SHAPES)])
    shape = SHAPES[cls % len(SHAPES)]
    x0, y0 = int((cx - w / 2) * size), int((cy - h / 2) * size)
    x1, y1 = int((cx + w / 2) * size), int((cy + h / 2) * size)
    if shape == "rect":
        cv2.rectangle(img, (x0, y0), (x1, y1), color, -1)
    elif shape == "circle":
        r = min(x1 - x0, y1 - y0) // 2
        cv2.circle(img, ((x0 + x1) // 2, (y0 + y1) // 2), max(r, 2), color, -1)
    elif shape == "triangle":
        pts = np.array([[(x0 + x1) // 2, y0], [x0, y1], [x1, y1]], np.int32)
        cv2.fillPoly(img, [pts], color)
    else:  # ellipse
        cv2.ellipse(img, ((x0 + x1) // 2, (y0 + y1) // 2),
                    (max((x1 - x0) // 2, 2), max((y1 - y0) // 2, 2)),
                    0, 0, 360, color, -1)


def _draw_distractor(img, rng):
    """Unlabeled clutter that must NOT be detected: desaturated gray/brown
    strokes and outlines (never a filled saturated class shape)."""
    size = img.shape[0]
    tone = int(rng.randint(40, 220))
    color = (tone + rng.randint(-15, 16), tone + rng.randint(-15, 16),
             tone + rng.randint(-15, 16))
    color = tuple(int(np.clip(c, 0, 255)) for c in color)
    kind = rng.randint(3)
    if kind == 0:  # line segment
        p0 = tuple(rng.randint(0, size, 2).tolist())
        p1 = tuple(rng.randint(0, size, 2).tolist())
        cv2.line(img, p0, p1, color, rng.randint(1, 4))
    elif kind == 1:  # hollow rectangle
        x0, y0 = rng.randint(0, size - 8, 2)
        x1 = x0 + rng.randint(6, max(7, size // 3))
        y1 = y0 + rng.randint(6, max(7, size // 3))
        cv2.rectangle(img, (x0, y0), (min(x1, size - 1), min(y1, size - 1)),
                      color, rng.randint(1, 3))
    else:  # hollow circle
        c = tuple(rng.randint(8, size - 8, 2).tolist())
        cv2.circle(img, c, int(rng.randint(4, max(5, size // 6))), color,
                   rng.randint(1, 3))


def make_split(dirpath: str, n: int, rng: np.random.RandomState,
               num_classes: int = 20, image_size: int = 224,
               max_objects: int = 4, min_obj: float = 0.12,
               max_obj: float = 0.45, distractors: int = 0,
               occlusion: bool = False) -> None:
    """``occlusion=True`` relaxes the anti-overlap rule (reject only when a
    new CENTER falls inside an earlier box of similar size) so crowded
    same-class groups occur; ``distractors`` adds that many unlabeled
    clutter strokes per image; ``min_obj``/``max_obj`` bound object widths
    as image fractions (the hard preset pushes these small)."""
    os.makedirs(dirpath, exist_ok=True)
    for i in range(n):
        # textured background: low-contrast noise + a soft gradient
        base = rng.randint(90, 150)
        img = rng.randint(base - 20, base + 20,
                          size=(image_size, image_size, 3)).astype(np.uint8)
        gx = np.linspace(0, rng.randint(-30, 30), image_size)[None, :, None]
        img = np.clip(img.astype(np.int32) + gx.astype(np.int32), 0, 255
                      ).astype(np.uint8)
        for _ in range(distractors):
            _draw_distractor(img, rng)
        lines = []
        placed = []
        # draw big -> small so later (smaller) objects occlude less area and
        # every labeled object keeps its top surface visible
        sizes = sorted((rng.uniform(min_obj, max_obj)
                        for _ in range(rng.randint(1, max_objects + 1))),
                       reverse=True)
        for w in sizes:
            cls = rng.randint(num_classes)
            h = min(w * rng.uniform(0.7, 1.4), 0.9)
            cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            if occlusion:
                # only reject near-coincident duplicates (center inside an
                # earlier box AND comparable size) — partial overlap stays
                clash = any(abs(cx - px) < pw / 4 and abs(cy - py) < ph / 4
                            and 0.5 < w / pw < 2.0
                            for px, py, pw, ph in placed)
            else:
                clash = any(abs(cx - px) < pw / 2 and abs(cy - py) < ph / 2
                            for px, py, pw, ph in placed)
            if clash:
                continue
            _draw_shape(img, cls, cx, cy, w, h, rng)
            placed.append((cx, cy, w, h))
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(os.path.join(dirpath, f"img{i:05d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        with open(os.path.join(dirpath, f"img{i:05d}.txt"), "w") as f:
            f.write("\n".join(lines))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=400)
    p.add_argument("--val", type=int, default=80)
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-objects", type=int, default=4)
    p.add_argument("--min-obj", type=float, default=0.12,
                   help="min object width as an image fraction")
    p.add_argument("--max-obj", type=float, default=0.45)
    p.add_argument("--distractors", type=int, default=0,
                   help="unlabeled clutter strokes per image")
    p.add_argument("--occlusion", action="store_true",
                   help="allow partial overlap between labeled objects")
    p.add_argument("--hard", action="store_true",
                   help="preset: the saturation-breaking benchmark variant "
                        "(small objects 0.04-0.28, up to 10 per image, 6 "
                        "distractors, occlusion on) — the 0.993-mAP round-4 "
                        "result needs a harder target to keep a signal")
    args = p.parse_args()
    if args.hard:
        args.max_objects, args.min_obj, args.max_obj = 10, 0.04, 0.28
        args.distractors, args.occlusion = 6, True
    if cv2 is None:
        raise SystemExit("cv2 required")
    rng = np.random.RandomState(args.seed)
    kw = dict(num_classes=args.num_classes, image_size=args.image_size,
              max_objects=args.max_objects, min_obj=args.min_obj,
              max_obj=args.max_obj, distractors=args.distractors,
              occlusion=args.occlusion)
    make_split(os.path.join(args.out, "train"), args.train, rng, **kw)
    make_split(os.path.join(args.out, "val"), args.val, rng, **kw)
    names = os.path.join(args.out, "synth.names")
    with open(names, "w") as f:
        f.write("\n".join(class_name(c) for c in range(args.num_classes)))
    print(f"wrote {args.train} train / {args.val} val images to {args.out}")


if __name__ == "__main__":
    main()
