"""Multi-scale training (YOLOv2-style, beyond parity — the reference trains
at one fixed resolution): grid scaling per resolution, config validation,
per-epoch deterministic size draws, fit() across resolutions with shared
params, and single-size equivalence with the canonical step."""

import dataclasses
import json
import os
import shutil

import jax
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, ScheduleConfig, TrainConfig,
)
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.parallel.mesh import create_mesh
from keras_object_detection_tpu.train.loop import (
    Trainer, multiscale_grid, validate_multiscale,
)


def _trainer(cfg):
    return Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                         devices=jax.devices()[:1]),
                   use_tensorboard=False)

FIXTURE = "/root/reference/yolo_v1/data"


def _cfg(tmp, sizes=(), every=1, image_size=56, head="conv", epochs=3):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head=head,
                          image_size=image_size, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(
            epochs=epochs, optimizer="adam",
            schedule=ScheduleConfig(kind="constant", base_lr=1e-3),
            checkpoint_dir=os.path.join(tmp, "ckpt"),
            log_dir=os.path.join(tmp, "logs"), seed=0,
            multiscale_sizes=tuple(sizes), multiscale_every=every),
    )


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ms_data")
    for i in range(2):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"img{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"img{i}.txt")
    return str(d)


def test_multiscale_grid_follows_resolution():
    # darknet24-style geometry: 448² -> S=7 means a 64 px backbone stride.
    cfg = Config(grid=GridConfig(grid=7),
                 model=ModelConfig(image_size=448, head="conv"))
    assert multiscale_grid(cfg, 384) == 6
    assert multiscale_grid(cfg, 448) == 7
    assert multiscale_grid(cfg, 512) == 8
    # at 2x the canonical feature size the conv head re-strides back down
    # (models/yolo.py ConvHead stride = max(feat // grid, 1), SAME padding)
    assert multiscale_grid(cfg, 896) == 7
    # GAP head always emits the configured grid
    gap = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, head="gap_dense"))
    assert multiscale_grid(gap, 384) == 7
    with pytest.raises(ValueError, match="multiple of the backbone"):
        multiscale_grid(cfg, 400)  # not a multiple of 64

    # stride-32 backbones (vgg16 emits 14x14 at 448, models/backbones.py:31):
    # the measured-geometry path must track the REAL feature map, not
    # image_size // grid arithmetic — and accept multiples of 32 like 416
    vgg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, backbone="vgg16"))
    assert multiscale_grid(vgg, 448) == 7   # feat 14, head stride 2
    assert multiscale_grid(vgg, 384) == 12  # feat 12, head stride 1
    assert multiscale_grid(vgg, 416) == 13  # multiple of the TRUE stride 32
    with pytest.raises(ValueError, match="multiple of the backbone"):
        multiscale_grid(vgg, 400)  # not a multiple of 32


def test_validate_multiscale_rejects_flatten_dense():
    cfg = Config(
        grid=GridConfig(grid=7),
        model=ModelConfig(image_size=448, head="flatten_dense"),
        train=TrainConfig(multiscale_sizes=(384, 448)))
    with pytest.raises(ValueError, match="resolution-agnostic head"):
        validate_multiscale(cfg)
    # empty tuple = off = always fine
    validate_multiscale(dataclasses.replace(
        cfg, train=TrainConfig(multiscale_sizes=())))


def test_epoch_size_deterministic_and_periodic(tmp_path, data_dir):
    cfg = _cfg(str(tmp_path), sizes=(48, 56, 64), every=2)
    tr = _trainer(cfg)
    draws = [tr._epoch_size(e) for e in range(12)]
    assert all(s in (48, 56, 64) for s in draws)
    # re-drawn only every 2 epochs
    assert all(draws[2 * i] == draws[2 * i + 1] for i in range(6))
    # deterministic across trainers
    tr2 = _trainer(cfg)
    assert draws == [tr2._epoch_size(e) for e in range(12)]
    # multiple sizes actually occur over a horizon
    assert len(set(draws)) > 1


def test_multiscale_fit_trains_across_resolutions(tmp_path, data_dir):
    """3 epochs over sizes {48, 56}: one set of fully-convolutional params
    trains at grids 6 and 7; losses stay finite, params move, the epoch
    log records the drawn resolution."""
    cfg = _cfg(str(tmp_path), sizes=(48, 56), every=1)
    ds = YoloDataset(data_dir, cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8, cache_in_memory=True)
    tr = _trainer(cfg)
    state0 = tr.init_state()
    p0 = jax.device_get(state0.params)
    state = tr.fit(ds, None, state=state0, verbose=False)
    tr.ckpt.close()

    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0

    log_path = os.path.join(cfg.train.log_dir, "train.jsonl")
    rows = [json.loads(l) for l in open(log_path)]
    assert len(rows) == 3
    sizes_seen = {r["train_size"] for r in rows}
    assert sizes_seen <= {48, 56} and len(sizes_seen) >= 1
    assert all(np.isfinite(r["total"]) for r in rows)
    # both resolutions are drawn on this seed (pin so the test really
    # exercises two compiled grids; update the seed if the draw changes)
    assert sizes_seen == {48, 56}, sizes_seen


def test_multiscale_fpn_grid_and_fit(tmp_path, data_dir):
    """fpn head + multiscale: the coarse grid tracks the backbone feature
    map exactly (size / pixel stride) and a 3-epoch fit across two
    resolutions trains one set of fully-conv FPN params at grids
    (6,12) and (7,14)."""
    anchors = ((0.8, 0.7), (0.5, 0.6), (0.35, 0.3),
               (0.2, 0.25), (0.12, 0.1), (0.05, 0.06))
    base = _cfg(str(tmp_path), sizes=(48, 56), every=1, head="fpn")
    cfg = dataclasses.replace(
        base,
        grid=dataclasses.replace(base.grid, anchors=anchors),
        model=dataclasses.replace(base.model, fpn_scales=2,
                                  activation="leaky_relu"))
    # darknet_micro at 56 -> feat 7 => pixel stride 8
    assert multiscale_grid(cfg, 48) == 6
    assert multiscale_grid(cfg, 56) == 7
    with pytest.raises(ValueError, match="multiple of the backbone"):
        multiscale_grid(cfg, 52)
    validate_multiscale(cfg)

    ds = YoloDataset(data_dir, cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8, cache_in_memory=True)
    tr = _trainer(cfg)
    state = tr.fit(ds, None, state=tr.init_state(), verbose=False)
    tr.ckpt.close()
    assert state is not None
    rows = [json.loads(l) for l in
            open(os.path.join(cfg.train.log_dir, "train.jsonl"))]
    assert len(rows) == 3
    assert all(np.isfinite(r["total"]) for r in rows)
    assert {r["train_size"] for r in rows} == {48, 56}


def test_multiscale_single_size_matches_canonical(tmp_path, data_dir):
    """multiscale_sizes=(image_size,) must reproduce the canonical
    single-scale run exactly (same program, same rng path)."""
    ds_kw = dict(max_boxes=8, cache_in_memory=True)
    cfg_a = _cfg(os.path.join(str(tmp_path), "a"), sizes=(), epochs=2)
    cfg_b = _cfg(os.path.join(str(tmp_path), "b"), sizes=(56,), epochs=2)

    losses = []
    for cfg in (cfg_a, cfg_b):
        ds = YoloDataset(data_dir, cfg.model.image_size,
                         cfg.data.batch_size, **ds_kw)
        tr = _trainer(cfg)
        state = tr.fit(ds, None, state=tr.init_state(), verbose=False)
        tr.ckpt.close()
        rows = [json.loads(l) for l in
                open(os.path.join(cfg.train.log_dir, "train.jsonl"))]
        losses.append([r["total"] for r in rows])
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
