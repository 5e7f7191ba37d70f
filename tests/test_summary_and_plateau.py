"""Model summary helper + ReduceLROnPlateau behavior."""

import os
import shutil

import jax
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, ScheduleConfig, TrainConfig,
    voc_full_config,
)
from keras_object_detection_tpu.models.summary import count_params, summarize

FIXTURE = "/root/reference/yolo_v1/data"


def test_count_params_flagship():
    # darknet24 + conv head at C=20, B=2: tens of millions of params
    n = count_params(voc_full_config())
    assert 20_000_000 < n < 120_000_000


def test_summarize_tiny():
    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"))
    text = summarize(cfg)
    # rich truncates long module names to the column width
    assert "YoloV1 Summary" in text and "Conv" in text and "params" in text


def test_reduce_on_plateau_scales_lr(tmp_path):
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.parallel.mesh import create_mesh
    from keras_object_detection_tpu.train.loop import Trainer

    d = tmp_path / "data"
    d.mkdir()
    for i in range(2):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"i{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"i{i}.txt")

    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(
            optimizer="sgd",
            # LR 0 -> val loss can never improve -> plateau fires every epoch
            schedule=ScheduleConfig(kind="constant", base_lr=1e-8),
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs")),
    )
    ds = YoloDataset(str(d), 224, 2, max_boxes=8)
    trainer = Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                            devices=jax.devices()[:1]),
                      use_tensorboard=False)
    # Script a flat val_loss so the plateau logic is deterministic.
    trainer._run_validation = (
        lambda state, ds_, with_map, stash=None: {"val_loss": 100.0})
    trainer.fit(ds, ds, epochs=4, reduce_on_plateau=(0.5, 1, 1e-12),
                verbose=False)
    import json

    lrs = [json.loads(l)["lr"]
           for l in open(os.path.join(cfg.train.log_dir, "train.jsonl"))]
    # epoch 0: improvement from inf (full LR); afterwards the flat loss
    # triggers a 0.5x scale every epoch (patience 1).
    assert lrs[0] == pytest.approx(1e-8)
    assert lrs[2] == pytest.approx(lrs[1] * 0.5)
    assert lrs[3] == pytest.approx(lrs[2] * 0.5)
    trainer.ckpt.close()
