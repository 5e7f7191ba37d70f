"""Host-side visualization (parity target: ref yolo_v1/utils.py:623-713
``get_tagged_img`` / ``get_grid_tagged_img``).

Same drawing semantics: green rectangles + "class, conf" labels; the grid
variant adds the SxS lattice and red center dots. Uses cv2 when present,
falling back to PIL.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    from PIL import Image, ImageDraw

    _HAS_CV2 = False


def _load_names(names_path: str) -> Sequence[str]:
    with open(names_path, "r") as f:
        return [x.strip() for x in f.readlines()]


def get_tagged_img(img: np.ndarray, boxes: np.ndarray, names_path: str) -> np.ndarray:
    """Draw NMS boxes ``(N, 6) [cls, conf, cx, cy, w, h]`` on an image
    (ref utils.py:623-663)."""
    img = np.ascontiguousarray(img)
    height, width = img.shape[0], img.shape[1]
    names = _load_names(names_path)
    for box in np.asarray(boxes):
        cls, conf, x, y, w, h = box[:6]
        xmin = int((x - w / 2) * width)
        ymin = int((y - h / 2) * height)
        xmax = int((x + w / 2) * width)
        ymax = int((y + h / 2) * height)
        label = f"{names[int(cls)]:s}, {conf:.2f}"
        if _HAS_CV2:
            img = cv2.rectangle(img, (xmin, ymin), (xmax, ymax), color=(0, 255, 0))
            img = cv2.putText(img, label, (xmin, ymin + 20),
                              fontFace=cv2.FONT_HERSHEY_PLAIN, fontScale=1,
                              color=(0, 255, 0))
        else:  # pragma: no cover
            pil = Image.fromarray(img)
            d = ImageDraw.Draw(pil)
            d.rectangle([xmin, ymin, xmax, ymax], outline=(0, 255, 0))
            d.text((xmin, ymin + 10), label, fill=(0, 255, 0))
            img = np.asarray(pil)
    return img


def get_grid_tagged_img(img: np.ndarray, boxes: np.ndarray, names_path: str,
                        grid: int = 7) -> np.ndarray:
    """Tagged image plus the SxS cell lattice and center dots
    (ref utils.py:666-713; lattice spacing derived from the image size rather
    than the reference's hardcoded 448)."""
    img = get_tagged_img(img, boxes, names_path)
    height, width = img.shape[0], img.shape[1]
    for box in np.asarray(boxes):
        cx, cy = int(box[2] * width), int(box[3] * height)
        if _HAS_CV2:
            img = cv2.circle(img, (cx, cy), radius=2, color=(0, 0, 255))
        else:  # pragma: no cover
            pil = Image.fromarray(img)
            ImageDraw.Draw(pil).ellipse([cx - 2, cy - 2, cx + 2, cy + 2],
                                        outline=(255, 0, 0))
            img = np.asarray(pil)
    for idx in range(grid - 1):
        a = int(width * ((idx + 1) / float(grid)))
        b = int(height * ((idx + 1) / float(grid)))
        if _HAS_CV2:
            img = cv2.line(img, (a, 0), (a, height), color=(255, 0, 255))
            img = cv2.line(img, (0, b), (width, b), color=(255, 0, 255))
        else:  # pragma: no cover
            pil = Image.fromarray(img)
            d = ImageDraw.Draw(pil)
            d.line([a, 0, a, height], fill=(255, 0, 255))
            d.line([0, b, width, b], fill=(255, 0, 255))
            img = np.asarray(pil)
    return img
