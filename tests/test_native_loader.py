"""Native C++ loader tests (native/kot_loader.cpp via ctypes): decode
correctness vs cv2, batch API, and error paths."""

import numpy as np
import pytest

from keras_object_detection_tpu.data import native

JPG = "/root/reference/yolo_v1/data/test.jpg"


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built")


def test_decode_matches_cv2_within_1lsb():
    cv2 = pytest.importorskip("cv2")
    img = native.decode_resize_file(JPG, 448, 448)
    ref = cv2.resize(
        cv2.cvtColor(cv2.imread(JPG), cv2.COLOR_BGR2RGB), (448, 448))
    assert img.shape == ref.shape == (448, 448, 3)
    diff = np.abs(img.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # bilinear rounding only


def test_decode_identity_size():
    cv2 = pytest.importorskip("cv2")
    ref = cv2.cvtColor(cv2.imread(JPG), cv2.COLOR_BGR2RGB)
    img = native.decode_resize_file(JPG, ref.shape[0], ref.shape[1])
    # no resize: decode must be bit-identical (same libjpeg-turbo)
    np.testing.assert_array_equal(img, ref)


def test_load_batch():
    imgs, ok = native.load_batch([JPG] * 5, 224, 224, n_threads=4)
    assert imgs.shape == (5, 224, 224, 3)
    assert ok.all()
    np.testing.assert_array_equal(imgs[0], imgs[4])


def test_missing_file_reports_status():
    imgs, ok = native.load_batch([JPG, "/nonexistent.jpg"], 64, 64)
    assert ok[0] and not ok[1]


def test_decode_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_resize_file("/nonexistent.jpg", 64, 64)


def test_corrupt_jpeg_reports_status(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0 this is not a jpeg")
    imgs, ok = native.load_batch([str(bad)], 64, 64)
    assert not ok[0]
