"""Multi-image generalization test through the full Trainer: synthesize a
small shapes dataset (class = colored rectangle), train the micro model with
real augmentation on, and require val mAP to become meaningfully nonzero —
the BASELINE "config 1" CPU-runnable train+eval loop, beyond single-image
overfitting."""

import os

import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.train.loop import Trainer

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

COLORS = {0: (230, 40, 40), 1: (40, 230, 40), 2: (40, 40, 230)}


def _make_dataset(dirpath, n, rng, size=128):
    os.makedirs(dirpath, exist_ok=True)
    for i in range(n):
        img = rng.randint(100, 140, size=(size, size, 3), dtype=np.uint8)
        lines = []
        for _ in range(rng.randint(1, 3)):
            cls = rng.randint(3)
            w, h = rng.uniform(0.25, 0.5, 2)
            cx = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            cy = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            x0, y0 = int((cx - w / 2) * size), int((cy - h / 2) * size)
            x1, y1 = int((cx + w / 2) * size), int((cy + h / 2) * size)
            img[y0:y1, x0:x1] = COLORS[cls]
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(os.path.join(dirpath, f"img{i:03d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        with open(os.path.join(dirpath, f"img{i:03d}.txt"), "w") as f:
            f.write("\n".join(lines))


@pytest.mark.slow
@pytest.mark.skipif(cv2 is None, reason="needs cv2 to synthesize jpgs")
def test_train_generalizes_on_synthetic_shapes(tmp_path):
    rng = np.random.RandomState(0)
    train_dir = str(tmp_path / "train")
    val_dir = str(tmp_path / "val")
    _make_dataset(train_dir, 24, rng)
    _make_dataset(val_dir, 8, rng)

    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=8, max_boxes_per_image=8,
                        crop_scale=(0.9, 1.0)),
        train=TrainConfig(
            epochs=170, optimizer="adam", noobj_mode="all",
            schedule=ScheduleConfig(kind="constant", base_lr=2e-3),
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs"), seed=0),
        # early-training confidences sit below the serving default 0.4;
        # a lower eval threshold surfaces the learned boxes sooner
        eval=EvalConfig(conf_threshold=0.25),
    )
    import jax

    from keras_object_detection_tpu.parallel.mesh import create_mesh

    train_ds = YoloDataset(train_dir, 56, 8, max_boxes=8, shuffle=True)
    val_ds = YoloDataset(val_dir, 56, 8, max_boxes=8)
    trainer = Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                            devices=jax.devices()[:1]),
                      use_tensorboard=False)
    # late-training annealing makes the outcome robust to RNG-stream changes
    # (at constant 2e-3 the 24-image run is borderline-seed-sensitive)
    state = trainer.fit(train_ds, val_ds, verbose=False,
                        reduce_on_plateau=(0.5, 25, 2e-4))
    results = trainer.evaluate(state, val_ds)
    trainer.ckpt.close()
    assert np.isfinite(results["val_loss"])
    # untrained mAP is ~0; a learned detector on held-out images must do
    # clearly better than chance on this easy task
    assert results["val_mAP"] > 0.15, f"val mAP too low: {results}"

    # int8 weight PTQ on the trained model must be near-lossless (the
    # validation ref convert_to_tflite.py:17-30 never ran; measured on the
    # 20-class synthetic benchmark: delta +0.0003)
    from keras_object_detection_tpu.export.quantize import (
        dequantize_params, quantize_params)

    deq = jax.device_get(dequantize_params(quantize_params(state.params)))
    q_results = trainer.evaluate(state.replace(params=deq), val_ds)
    delta = q_results["val_mAP"] - results["val_mAP"]
    # On this 8-image val set a single flipped borderline detection moves
    # mAP by ~0.1 either way, so the bound only asserts int8 does not
    # COLLAPSE accuracy (the 200-image measurement in benchmarks/
    # ptq_delta.json pins the delta at ~+0.01).
    assert delta > -0.15, (
        f"int8 PTQ collapsed mAP: {delta} ({q_results} vs {results})")
