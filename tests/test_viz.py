"""Visualization tests (ref utils.py:623-713 surface)."""

import numpy as np

from keras_object_detection_tpu.utils.viz import get_grid_tagged_img, get_tagged_img

NAMES = "/root/reference/yolo_v1/data/test.names"


def _img():
    return np.zeros((224, 224, 3), np.uint8)


def test_tagged_img_draws_green_boxes():
    boxes = np.array([[0.0, 0.9, 0.5, 0.5, 0.4, 0.4]], np.float32)
    out = get_tagged_img(_img(), boxes, NAMES)
    assert out.shape == (224, 224, 3)
    # green channel painted along the box border rows
    ymin = int((0.5 - 0.2) * 224)
    assert out[ymin, :, 1].max() == 255
    assert out.sum() > 0


def test_tagged_img_no_boxes_is_noop():
    out = get_tagged_img(_img(), np.zeros((0, 6), np.float32), NAMES)
    assert out.sum() == 0


def test_grid_tagged_img_draws_lattice():
    out = get_grid_tagged_img(_img(), np.zeros((0, 6), np.float32), NAMES)
    # magenta lattice lines at multiples of 1/7
    a = int(224 * (1 / 7.0))
    assert out[:, a, 0].max() == 255 and out[:, a, 2].max() == 255
    assert out[a, :, 0].max() == 255


def test_grid_tagged_img_center_dot():
    boxes = np.array([[2.0, 0.8, 0.5, 0.5, 0.2, 0.2]], np.float32)
    out = get_grid_tagged_img(_img(), boxes, NAMES)
    # red center dot at (112, 112)
    patch = out[108:117, 108:117]
    assert patch[..., 2].max() == 255


def test_visualize_dataset_tool(tmp_path):
    """The dataset visual self-test tool runs end-to-end and writes images."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/visualize_dataset.py",
         "--data-dir", "/root/reference/yolo_v1/data",
         "--names", NAMES, "--out-dir", str(tmp_path), "--image-size", "224"],
        capture_output=True, text=True, timeout=570,
        # PALLAS_AXON_POOL_IPS="" skips the axon sitecustomize entirely: its
        # relay handshake stalls a fresh CPU-only interpreter for ~4 minutes
        # (6.8 s without it — see CLAUDE.md environment gotchas)
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert (tmp_path / "test_tagged.jpg").exists()
    assert (tmp_path / "test_grid.jpg").exists()
