"""Gradient accumulation (TrainConfig.grad_accum_steps): microbatched
lax.scan inside the one jitted step, gradients summed before a single
optimizer update.

Exactness argument under test: the loss is SUM-reduced (reference
semantics, ref loss.py:100-215), so microbatch gradients add up to the
full-batch gradient exactly; the only semantic difference is BatchNorm
batch statistics (per microbatch). The parity test below removes that
difference by feeding a batch of IDENTICAL images with augmentation and
dropout disabled — then per-microbatch BN batch stats equal full-batch
stats, the updated params must match the canonical step to float tolerance,
and the BN RUNNING stats follow the exact N-sequential-updates formula."""

import dataclasses
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, ScheduleConfig, TrainConfig,
)
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.parallel.mesh import create_mesh
from keras_object_detection_tpu.train.loop import (
    Trainer, create_train_state, make_train_step,
)

FIXTURE = "/root/reference/yolo_v1/data"


def _cfg(accum, batch=4, dropout=0.0, deterministic_augment=True,
         optimizer="sgd", **train_kw):
    data_kw = dict(batch_size=batch, max_boxes_per_image=8)
    if deterministic_augment:
        # identity augmentation: per-microbatch rng keys then have no effect
        data_kw.update(hflip_prob=0.0, color_jitter=(0.0, 0.0, 0.0, 0.0),
                       crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0))
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32",
                          dropout_rate=dropout),
        data=DataConfig(**data_kw),
        train=TrainConfig(
            optimizer=optimizer, grad_accum_steps=accum,
            schedule=ScheduleConfig(kind="constant", base_lr=1e-2),
            **train_kw),
    )


def _identical_batch(cfg, n):
    """n copies of the same image/boxes: per-microbatch BN statistics then
    equal full-batch statistics, making accumulation exactly equivalent."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (cfg.model.image_size, cfg.model.image_size, 3),
                      dtype=np.uint8)
    boxes = np.zeros((cfg.data.max_boxes_per_image, 5), np.float32)
    boxes[0] = [0.5, 0.5, 0.4, 0.3, 1.0]
    boxes[1] = [0.25, 0.25, 0.2, 0.2, 2.0]
    valid = np.zeros(cfg.data.max_boxes_per_image, bool)
    valid[:2] = True
    tile = lambda x: jnp.asarray(np.stack([x] * n))
    return tile(img), tile(boxes), tile(valid)


def _run_step(cfg, batch_arrays):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    imgs, boxes, valid = batch_arrays
    new_state, metrics = step(state, imgs, boxes, valid, jax.random.PRNGKey(7))
    return jax.device_get(new_state.params), \
        jax.device_get(new_state.batch_stats), \
        {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_canonical_on_identical_batch(accum):
    batch = 4
    cfg1 = _cfg(1, batch=batch)
    cfgN = _cfg(accum, batch=batch)
    data = _identical_batch(cfg1, batch)
    p1, s1, m1 = _run_step(cfg1, data)
    pN, sN, mN = _run_step(cfgN, data)

    for k in m1:
        np.testing.assert_allclose(mN[k], m1[k], rtol=2e-4,
                                   err_msg=f"metric {k}")
    # f32 cancellation noise through the BN backward concentrates in the
    # first conv layer's gradient (observed max ~1.3e-4 post-update); a wrong
    # accumulation (dropped/duplicated microbatch) shifts params by
    # O(lr*|grad|) ~ 1e-2 on most elements, so 5e-4 still discriminates.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=5e-4),
        p1, pN)
    # BN RUNNING stats update once per microbatch (the standard accumulation
    # semantics): with identical per-microbatch stats s, N sequential updates
    # give m^N r0 + (1 - m^N) s, vs the canonical m r0 + (1 - m) s — assert
    # that exact relationship by solving s out of the canonical update.
    m = 0.99  # models/layers.py BatchNorm momentum
    s0 = jax.device_get(create_train_state(
        cfg1, jax.random.PRNGKey(0)).batch_stats)
    jax.tree_util.tree_map(
        lambda r0, a, b: np.testing.assert_allclose(
            b, m ** accum * r0 + (1 - m ** accum) * (a - m * r0) / (1 - m),
            rtol=0, atol=5e-4),
        s0, s1, sN)


def test_accum_distinct_microbatches_sum_metrics():
    """With DISTINCT images the loss metrics are still exactly the sum of the
    per-microbatch sum-reduced terms — compare the accum=2 step's metrics
    against two manual half-batch loss evaluations."""
    from keras_object_detection_tpu.core.grid import encode_grid
    from keras_object_detection_tpu.losses.yolo import yolo_v1_loss_terms

    cfg = _cfg(2, batch=4)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 56, 56, 3), dtype=np.uint8))
    boxes = np.zeros((4, 8, 5), np.float32)
    boxes[:, 0] = [[0.5, 0.5, 0.4, 0.3, 0.0]] * 4
    valid = np.zeros((4, 8), bool)
    valid[:, 0] = True
    boxes, valid = jnp.asarray(boxes), jnp.asarray(valid)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    _, metrics = step(state, imgs, boxes, valid, jax.random.PRNGKey(3))

    # manual oracle: forward each strided microbatch (i::2) sequentially with
    # the same rng path the scan uses, summing the sum-reduced loss terms
    from keras_object_detection_tpu.data.augment import augment_batch
    akey, dkey = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(3), state.step))
    g = cfg.grid
    stats = state.batch_stats
    total = {}
    for i in range(2):
        sel = jnp.arange(4) % 2 == i
        aimg, abx, avl = augment_batch(
            imgs[sel], boxes[sel], valid[sel], jax.random.fold_in(akey, i),
            hflip_prob=0.0, color_strengths=(0.0,) * 4,
            crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0),
            min_visibility=cfg.data.min_visibility, out_size=56)
        y_true = jax.vmap(lambda b, v: encode_grid(
            b, v, g.num_classes, g.num_boxes, g.grid))(abx, avl)
        y_pred, upd = state.apply_fn(
            {"params": state.params, "batch_stats": stats}, aimg,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(dkey, i)})
        stats = upd["batch_stats"]
        terms = yolo_v1_loss_terms(
            y_true, y_pred.reshape(y_true.shape), g.num_classes, g.num_boxes,
            cfg.train.lambda_coord, cfg.train.lambda_noobj,
            cfg.train.noobj_mode, cfg.train.box_loss_mode)
        for k, v in terms.items():
            total[k] = total.get(k, 0.0) + float(v)

    for k in total:
        np.testing.assert_allclose(float(metrics[k]), total[k], rtol=2e-4,
                                   err_msg=f"metric {k}")


def test_accum_rejects_indivisible_batch():
    cfg = _cfg(3, batch=4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    data = _identical_batch(cfg, 4)
    with pytest.raises(ValueError, match="must divide"):
        step(state, *data, jax.random.PRNGKey(0))


def test_trainer_validates_accum_vs_mesh():
    # batch 8 passes the dp-divisibility check (dp=8 fake devices) but not
    # the accum*dp one (8 % 16 != 0)
    cfg = _cfg(2, batch=8)
    with pytest.raises(ValueError, match="grad_accum_steps"):
        Trainer(cfg, use_tensorboard=False)


def test_accum_trains_on_data_parallel_mesh(tmp_path):
    """accum=2 over a dp=2 mesh: full Trainer.fit epoch, finite losses,
    params move."""
    d = tmp_path / "data"
    d.mkdir()
    for i in range(4):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"i{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"i{i}.txt")
    cfg = _cfg(2, batch=4, deterministic_augment=False, optimizer="adam",
               epochs=2,
               checkpoint_dir=str(tmp_path / "ckpt"),
               log_dir=str(tmp_path / "logs"))
    ds = YoloDataset(str(d), cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8, cache_in_memory=True)
    tr = Trainer(cfg, mesh=create_mesh(data_parallel=2,
                                       devices=jax.devices()[:2]),
                 use_tensorboard=False)
    state0 = tr.init_state()
    p0 = jax.device_get(state0.params)
    state = tr.fit(ds, None, state=state0, verbose=False)
    tr.ckpt.close()
    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
