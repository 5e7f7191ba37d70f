"""Decode-ahead disk cache: pre-decoded raw uint8 images + labels, memmapped.

The host input path is JPEG-decode-bound on small hosts (ROADMAP "host input
path": ~250 img/s at 448 square on one core, while the train step consumes
700+). ``cache_in_memory`` solves it for subsets that fit in RAM; this module
is the spill-to-disk variant for full datasets (VOC-2007 trainval at 448
square is ~9 GB raw): decode every image ONCE into a flat uint8 memmap, then
serve epochs with pread-speed slicing instead of cv2 decode.

No reference counterpart (the reference re-decodes every image every epoch,
ref dataset.py:75-76); this is a beyond-parity throughput component.

Layout under ``cache_dir``:
  meta.json    — {image_size, max_boxes, count, paths, mtimes} (validity key)
  images.u8    — (N, S, S, 3) uint8 memmap
  boxes.f32    — (N, M, 5) float32 memmap
  valid.u8     — (N, M) uint8 memmap (bool)
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from keras_object_detection_tpu.data.reader import load_example

META_NAME = "meta.json"


def _meta_for(paths: List[str], image_size: int, max_boxes: int,
              letterbox: bool = False) -> dict:
    return {
        "version": 1,
        "image_size": image_size,
        "letterbox": letterbox,
        "max_boxes": max_boxes,
        "count": len(paths),
        "paths": [os.path.basename(p) for p in paths],
        "mtimes": [os.path.getmtime(p) for p in paths],
    }


class DiskCache:
    """Memmapped view over a built cache; index-aligned with ``paths``."""

    def __init__(self, cache_dir: str, count: int, image_size: int,
                 max_boxes: int):
        s, m = image_size, max_boxes
        self.images = np.memmap(os.path.join(cache_dir, "images.u8"),
                                np.uint8, "r", shape=(count, s, s, 3))
        self.boxes = np.memmap(os.path.join(cache_dir, "boxes.f32"),
                               np.float32, "r", shape=(count, m, 5))
        self.valid = np.memmap(os.path.join(cache_dir, "valid.u8"),
                               np.uint8, "r", shape=(count, m))

    def load(self, i: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (np.asarray(self.images[i]), np.asarray(self.boxes[i]),
                np.asarray(self.valid[i]).astype(bool))


def open_or_build(paths: List[str], image_size: int, max_boxes: int,
                  cache_dir: str, verbose: bool = False,
                  letterbox: bool = False) -> DiskCache:
    """Return a valid ``DiskCache`` for ``paths``, (re)building if the cache
    is absent or stale (different size/boxes/file set/mtimes)."""
    want = _meta_for(paths, image_size, max_boxes, letterbox)
    meta_path = os.path.join(cache_dir, META_NAME)
    if os.path.exists(meta_path):
        try:
            have = json.load(open(meta_path))
        except (ValueError, OSError):
            have = None
        if have == want:
            return DiskCache(cache_dir, len(paths), image_size, max_boxes)

    os.makedirs(cache_dir, exist_ok=True)
    s, m, n = image_size, max_boxes, len(paths)
    images = np.memmap(os.path.join(cache_dir, "images.u8"), np.uint8, "w+",
                       shape=(n, s, s, 3))
    boxes = np.memmap(os.path.join(cache_dir, "boxes.f32"), np.float32, "w+",
                      shape=(n, m, 5))
    valid = np.memmap(os.path.join(cache_dir, "valid.u8"), np.uint8, "w+",
                      shape=(n, m))
    for i, p in enumerate(paths):
        img, bx, vl = load_example(p, s, m, letterbox=letterbox)
        images[i], boxes[i], valid[i] = img, bx, vl.astype(np.uint8)
        if verbose and (i + 1) % 500 == 0:
            print(f"disk cache: {i + 1}/{n} decoded", flush=True)
    images.flush(), boxes.flush(), valid.flush()
    del images, boxes, valid
    # meta written LAST: a crashed build never validates
    with open(meta_path, "w") as f:
        json.dump(want, f)
    return DiskCache(cache_dir, n, image_size, max_boxes)
