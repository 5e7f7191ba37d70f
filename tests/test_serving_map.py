"""Serving-path mAP tool (tools/serving_map.py): scores what
InferenceModel.predict actually serves (TTA / Soft-NMS / checkpoint
averaging / EMA) against as-is GTs. Two layers of evidence: a unit test
proving the tool's GT-layout conversion + perfect-prediction score via the
functional metric, and an end-to-end subprocess run over a real
checkpoint."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

FIXTURE = "/root/reference/yolo_v1/data"


def test_gt_layout_conversion_perfect_predictions():
    """The tool's [cx,cy,w,h,cls] -> [cls,conf,cx,cy,w,h] conversion feeds
    mean_average_precision correctly: serving the GTs back as predictions
    scores mAP 1.0 for present classes."""
    from keras_object_detection_tpu.ops.map import mean_average_precision

    boxes = np.zeros((2, 4, 5), np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.4, 0.4, 0.0]
    boxes[0, 1] = [0.2, 0.2, 0.2, 0.2, 1.0]
    boxes[1, 0] = [0.7, 0.7, 0.3, 0.3, 2.0]
    valid = np.zeros((2, 4), bool)
    valid[0, :2] = True
    valid[1, 0] = True

    gt = np.concatenate(
        [boxes[..., 4:5], np.ones_like(boxes[..., :1]), boxes[..., :4]],
        axis=-1)
    value = float(mean_average_precision(gt, valid, gt, valid, 3, 0.5))
    assert value == pytest.approx(1.0, abs=1e-4)


@pytest.mark.slow
def test_serving_map_tool_end_to_end(tmp_path):
    """Train 2 epochs on the fixture, then run the tool twice (plain and
    --tta hflip --avg-ckpts 2) and check the JSON output."""
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), data / f"i{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), data / f"i{i}.txt")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           # drop conftest's 8 fake devices: batch 2 must divide the mesh
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    ckpt = str(tmp_path / "ckpt")
    r = subprocess.run(
        [sys.executable, "train.py", "--data-dir", str(data),
         "--preset", "tiny", "--epochs", "2",
         "--checkpoint-dir", ckpt, "--log-dir", str(tmp_path / "logs")],
        capture_output=True, text=True, timeout=570, env=env)
    assert r.returncode == 0, r.stderr[-500:]

    for extra in ([], ["--tta", "hflip", "--avg-ckpts", "2"]):
        r = subprocess.run(
            [sys.executable, "tools/serving_map.py",
             "--checkpoint-dir", ckpt, "--data", str(data),
             "--batch-size", "2", "--conf-threshold", "0.1"] + extra,
            capture_output=True, text=True, timeout=570, env=env)
        assert r.returncode == 0, r.stderr[-500:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert 0.0 <= out["serving_mAP"] <= 1.0
        assert out["images"] == 2
        if extra:
            assert out["tta"] == "hflip" and out["avg_ckpts"] == 2
