"""Host-side YOLO-format dataset reading (parity target:
ref yolo_v1/dataset.py:18-123 ``YoloV1Generator``).

The reference couples disk IO, augmentation, and label encoding in a Python
``keras.utils.Sequence``; here the host only decodes JPEGs and parses label
txt files into padded arrays — augmentation and grid encoding run on-device
(see ``data.augment`` and ``core.grid``), keeping the host loop to bytes-in.

Format: a directory of ``*.jpg`` files, each with a sibling ``*.txt`` of
``class_id cx cy w h`` rows in image ratios (ref dataset.py:114-123).
"""

from __future__ import annotations

import glob
import os
from typing import List, Tuple

import numpy as np

from keras_object_detection_tpu.data import native as _native

try:  # cv2 matches the reference's resize bit-for-bit (eval-path parity)
    import cv2

    cv2.setNumThreads(0)  # same contention fix as ref dataset.py:62
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False

# Decode priority: cv2 (reference-exact resize) unless KOT_NATIVE=1 selects
# the C++ loader (native/kot_loader.cpp — persistent thread pool, within
# 1 LSB of cv2's resize); the native loader is also the fallback when cv2 is
# absent.
_USE_NATIVE = os.environ.get("KOT_NATIVE", "0") == "1" or not _HAS_CV2


def list_examples(data_dir: str) -> List[str]:
    """Sorted jpg paths in ``data_dir`` (ref dataset.py:20 globs unsorted;
    we sort for determinism across hosts)."""
    return sorted(glob.glob(os.path.join(data_dir, "*.jpg")))


def read_yolo_labels(label_path: str) -> np.ndarray:
    """Parse a YOLO txt into ``(N, 5)`` rows of ``[cx, cy, w, h, class_id]``
    (ref dataset.py:114-123 ``_get_boxes`` column order)."""
    rows = []
    with open(label_path, "r") as f:
        for line in f.read().splitlines():
            if not line.strip():
                continue
            class_id, cx, cy, w, h = map(float, line.split(" "))
            rows.append([cx, cy, w, h, class_id])
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.asarray(rows, np.float32)


def load_example(
    img_path: str, image_size: int, max_boxes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one jpg + labels to fixed shapes.

    Returns ``(image_u8 (H, W, 3) RGB resized to image_size,
    boxes (max_boxes, 5), valid (max_boxes,))``. The resize is bilinear
    (cv2 default), matching the reference eval transform ``A.Resize``
    (ref dataset.py:143-146); normalization to [0, 1] happens on-device.
    """
    if _USE_NATIVE and _native.available():
        img = _native.decode_resize_file(img_path, image_size, image_size)
    elif _HAS_CV2:
        img = cv2.imread(img_path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)  # ref dataset.py:75-76
        img = cv2.resize(img, (image_size, image_size))
    else:  # pragma: no cover
        img = np.asarray(
            Image.open(img_path).convert("RGB").resize((image_size, image_size))
        )

    raw = read_yolo_labels(os.path.splitext(img_path)[0] + ".txt")
    n = min(len(raw), max_boxes)
    boxes = np.zeros((max_boxes, 5), np.float32)
    valid = np.zeros((max_boxes,), bool)
    boxes[:n] = raw[:n]
    valid[:n] = True
    return img.astype(np.uint8), boxes, valid
