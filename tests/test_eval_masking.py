"""Per-image validity masking through eval (EvalConfig.mask_padded_images),
EMA override on the dataset eval path, non-mutating set_learning_rate, and
epoch-accurate resume — the round-2 de-biasing/hygiene batch.

The reference never pads eval batches (it shrinks the last one, ref
dataset.py:38-47); our static-shape pipeline pads, so without masking the
padded images add phantom no-object loss terms and spurious detections.
"""

import dataclasses
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.eval.evaluator import Evaluator
from keras_object_detection_tpu.ops.map import MeanAveragePrecision
from keras_object_detection_tpu.parallel.mesh import create_mesh
from keras_object_detection_tpu.train.loop import (
    Trainer, create_train_state, make_eval_step, set_learning_rate,
)

FIXTURE = "/root/reference/yolo_v1/data"


def _micro_config(tmp, batch_size=4, **eval_kw):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=batch_size, max_boxes_per_image=8),
        train=TrainConfig(
            epochs=1, optimizer="adam",
            schedule=ScheduleConfig(kind="constant", base_lr=1e-3),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            log_dir=os.path.join(tmp, "logs"), seed=0),
        eval=EvalConfig(**eval_kw),
    )


@pytest.fixture(scope="module")
def six_image_dir(tmp_path_factory):
    """6 images with batch 4 -> the 2nd batch holds 2 real + 2 padded."""
    d = tmp_path_factory.mktemp("sixdata")
    for i in range(6):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"img{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"img{i}.txt")
    return str(d)


def test_masked_val_loss_is_exact_unpadded_value(tmp_path, six_image_dir):
    """Masked val_loss on a padded 6-image/batch-4 set must equal the
    batch-size-scaled per-image mean (= the value a shrink-last-batch
    pipeline would produce); unmasked val_loss is biased by the pad."""
    cfg = _micro_config(str(tmp_path), batch_size=4, mask_padded_images=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    # Ground truth: per-image losses via a batch-1 pass (never padded).
    estep = jax.jit(make_eval_step(cfg))
    ds1 = YoloDataset(six_image_dir, 56, 1, max_boxes=8)
    per_image = []
    for images, boxes, valid in ds1.epoch():
        loss, _, _ = estep(state, jnp.asarray(images), jnp.asarray(boxes),
                           jnp.asarray(valid))
        per_image.append(float(loss))
    assert len(per_image) == 6
    exact = cfg.data.batch_size * sum(per_image) / 6.0

    ds4 = YoloDataset(six_image_dir, 56, 4, max_boxes=8)
    mesh = create_mesh(data_parallel=1, devices=jax.devices()[:1])

    masked_trainer = Trainer(cfg, mesh=mesh, use_tensorboard=False)
    masked = masked_trainer._run_validation(state, ds4, with_map=False)
    masked_trainer.ckpt.close()

    cfg_plain = dataclasses.replace(cfg, eval=EvalConfig())
    plain_trainer = Trainer(cfg_plain, mesh=mesh, use_tensorboard=False)
    plain = plain_trainer._run_validation(state, ds4, with_map=False)
    plain_trainer.ckpt.close()

    np.testing.assert_allclose(masked["val_loss"], exact, rtol=1e-5)
    # the phantom no-object terms of 2 zero-padded images bias the plain path
    assert abs(plain["val_loss"] - exact) > 1e-3


def test_masked_map_equals_dropping_padded_rows():
    """update_state(image_valid=...) must equal feeding only the real rows."""
    rng = np.random.RandomState(0)
    yt = np.zeros((4, 7, 7, 13), np.float32)
    for b in range(3):  # 3 real images with one object each
        i, j = rng.randint(7, size=2)
        yt[b, i, j, rng.randint(3)] = 1
        yt[b, i, j, 3] = 1
        yt[b, i, j, 4:8] = [0.5, 0.5, 0.3, 0.3]
    yp = yt.copy()  # perfect detector on the real rows -> mAP 1.0
    # the PAD row gets high-confidence junk predictions (as a zero image
    # through an untrained net can produce)
    # (confidences above the perfect rows' 1.0, so the FPs rank first and
    # actually dent the precision at every recall point)
    yp[3] = rng.uniform(1.1, 2.0, size=yp[3].shape)

    m_masked = MeanAveragePrecision(3, 2)
    m_masked.update_state(yt, yp, image_valid=np.array([1, 1, 1, 0], bool))
    m_real = MeanAveragePrecision(3, 2)
    m_real.update_state(yt[:3], yp[:3])
    assert m_masked.result() == pytest.approx(m_real.result(), abs=1e-7)

    # and the junk pad row must actually perturb the unmasked value
    m_plain = MeanAveragePrecision(3, 2)
    m_plain.update_state(yt, yp)
    assert m_plain.result() != pytest.approx(m_real.result(), abs=1e-7)


def test_evaluator_masking(tmp_path, six_image_dir):
    cfg = _micro_config(str(tmp_path), batch_size=4, mask_padded_images=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    ds = YoloDataset(six_image_dir, 56, 4, max_boxes=8)
    masked = Evaluator(cfg).evaluate(state, ds)
    plain = Evaluator(
        dataclasses.replace(cfg, eval=EvalConfig())).evaluate(state, ds)
    assert np.isfinite(masked["loss"]) and np.isfinite(plain["loss"])
    assert masked["loss"] != plain["loss"]


def test_evaluator_use_ema_override(tmp_path, six_image_dir):
    """The dataset eval path must honor an explicit use_ema, matching the
    single-image InferenceModel path (CLI --use-ema consistency)."""
    cfg = _micro_config(str(tmp_path), batch_size=4)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       eval_with_ema=True))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    # make EMA params clearly different from the live params
    state = state.replace(ema_params=jax.tree_util.tree_map(
        lambda p: p * 0.5, state.params))
    ds = YoloDataset(six_image_dir, 56, 4, max_boxes=8)

    loss_live = Evaluator(cfg, use_ema=False).evaluate(
        state, ds, with_map=False)["loss"]
    loss_ema = Evaluator(cfg, use_ema=True).evaluate(
        state, ds, with_map=False)["loss"]
    loss_cfg = Evaluator(cfg).evaluate(state, ds, with_map=False)["loss"]
    assert loss_live != loss_ema
    assert loss_cfg == loss_ema  # config says eval_with_ema=True


def test_set_learning_rate_non_mutating(tmp_path):
    cfg = _micro_config(str(tmp_path))
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    before = float(state.opt_state.hyperparams["learning_rate"])
    new = set_learning_rate(state, 123.0)
    assert float(new.opt_state.hyperparams["learning_rate"]) == 123.0
    assert float(state.opt_state.hyperparams["learning_rate"]) == before


def test_fit_start_epoch_controls_checkpoint_axis(tmp_path, six_image_dir):
    """Resume must continue the epoch/LR axis from the checkpoint's epoch
    number, independent of optimizer-step arithmetic (batch-size changes)."""
    cfg = _micro_config(str(tmp_path), batch_size=2)
    ds = YoloDataset(six_image_dir, 56, 2, max_boxes=8)
    trainer = Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                            devices=jax.devices()[:1]),
                      use_tensorboard=False)
    state = trainer.fit(ds, ds, epochs=1, verbose=False)
    assert trainer.ckpt.latest_epoch == 0
    state = trainer.fit(ds, ds, epochs=1, state=state, verbose=False,
                        start_epoch=trainer.ckpt.latest_epoch + 1)
    assert trainer.ckpt.latest_epoch == 1
    trainer.ckpt.close()
