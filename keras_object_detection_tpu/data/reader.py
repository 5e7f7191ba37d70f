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


LETTERBOX_PAD = 114  # the conventional detection gray fill


def letterbox_geometry(h: int, w: int, image_size: int):
    """The aspect-preserving placement of an (h, w) image inside an
    ``image_size`` square: ``(new_h, new_w, pad_y, pad_x)`` with the content
    centered (left/top pads floor the split)."""
    scale = image_size / max(h, w)
    nh = max(1, round(h * scale))
    nw = max(1, round(w * scale))
    return nh, nw, (image_size - nh) // 2, (image_size - nw) // 2


def letterbox_image(img: np.ndarray, image_size: int) -> np.ndarray:
    """Aspect-preserving resize + centered gray padding to a square."""
    nh, nw, py, px = letterbox_geometry(img.shape[0], img.shape[1], image_size)
    if _HAS_CV2:
        resized = cv2.resize(img, (nw, nh))
    else:  # pragma: no cover
        resized = np.asarray(Image.fromarray(img).resize((nw, nh)))
    out = np.full((image_size, image_size, 3), LETTERBOX_PAD, np.uint8)
    out[py:py + nh, px:px + nw] = resized
    return out


def letterbox_boxes(boxes: np.ndarray, h: int, w: int,
                    image_size: int) -> np.ndarray:
    """Remap ``(N, 5) [cx, cy, w, h, cls]`` boxes (ratios of the ORIGINAL
    (h, w) image) into letterboxed-square ratios, using the exact rounded
    placement so boxes stay aligned with the resized pixels."""
    nh, nw, py, px = letterbox_geometry(h, w, image_size)
    out = boxes.copy()
    out[:, 0] = (boxes[:, 0] * nw + px) / image_size
    out[:, 1] = (boxes[:, 1] * nh + py) / image_size
    out[:, 2] = boxes[:, 2] * nw / image_size
    out[:, 3] = boxes[:, 3] * nh / image_size
    return out


def unletterbox_detections(dets: np.ndarray, h: int, w: int,
                           image_size: int) -> np.ndarray:
    """Inverse mapping for serving: ``(N, 6) [cls, conf, cx, cy, w, h]``
    detections in letterboxed ratios -> ratios of the original (h, w)
    image (for drawing/reporting on the un-padded photo)."""
    nh, nw, py, px = letterbox_geometry(h, w, image_size)
    out = dets.copy()
    out[:, 2] = (dets[:, 2] * image_size - px) / nw
    out[:, 3] = (dets[:, 3] * image_size - py) / nh
    out[:, 4] = dets[:, 4] * image_size / nw
    out[:, 5] = dets[:, 5] * image_size / nh
    return out


def load_example(
    img_path: str, image_size: int, max_boxes: int, letterbox: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one jpg + labels to fixed shapes.

    Returns ``(image_u8 (H, W, 3) RGB resized to image_size,
    boxes (max_boxes, 5), valid (max_boxes,))``. The default resize is
    square bilinear (cv2 default), matching the reference eval transform
    ``A.Resize`` (ref dataset.py:143-146) — it distorts aspect.
    ``letterbox=True`` (beyond parity) preserves aspect with centered gray
    padding and remaps the boxes consistently; normalization to [0, 1]
    happens on-device either way.
    """
    if letterbox:
        if _HAS_CV2:
            img = cv2.imread(img_path)
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        else:  # pragma: no cover
            img = np.asarray(Image.open(img_path).convert("RGB"))
        h, w = img.shape[:2]
        img = letterbox_image(img, image_size)
    elif _USE_NATIVE and _native.available():
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
    if letterbox and len(raw):
        raw = letterbox_boxes(raw, h, w, image_size)
    n = min(len(raw), max_boxes)
    boxes = np.zeros((max_boxes, 5), np.float32)
    valid = np.zeros((max_boxes,), bool)
    boxes[:n] = raw[:n]
    valid[:n] = True
    return img.astype(np.uint8), boxes, valid
