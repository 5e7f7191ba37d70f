"""FPN (YOLOv3-style) model family tests — beyond parity (the reference
repo is YOLOv1-only; arXiv:1804.02767): anchor partition, per-scale
encode/decode round-trips, scale routing, head topology, loss semantics,
the mAP accumulator's fpn mode, training-step integration, and serving.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.core.fpn import (
    decode_fpn_grids,
    decode_fpn_targets,
    encode_fpn_grids,
    fpn_grid_sizes,
    partition_anchors,
)
from keras_object_detection_tpu.models.yolo import build_model

# 6 anchors over 2 scales (area-descending within each scale after split)
ANCHORS6 = ((0.8, 0.7), (0.5, 0.6), (0.35, 0.3),
            (0.2, 0.25), (0.12, 0.1), (0.05, 0.06))
# 9 anchors / 3 scales — the paper's layout
ANCHORS9 = ANCHORS6 + ((0.03, 0.04), (0.6, 0.2), (0.15, 0.5))


def _fpn_config(num_classes=3, scales=2, anchors=ANCHORS6, image=56,
                grid=7, batch=2):
    return Config(
        grid=GridConfig(grid=grid, num_boxes=2, num_classes=num_classes,
                        anchors=anchors),
        model=ModelConfig(backbone="darknet_micro", head="fpn",
                          fpn_scales=scales, image_size=image,
                          compute_dtype="float32",
                          activation="leaky_relu"),
        data=DataConfig(batch_size=batch, max_boxes_per_image=8,
                        hflip_prob=0.0, color_jitter=(0, 0, 0, 0),
                        crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0)),
        train=TrainConfig(optimizer="adam", epochs=1,
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
        eval=EvalConfig(conf_threshold=0.1),
    )


def test_partition_anchors_by_area():
    parts = partition_anchors(ANCHORS6, 2)
    assert len(parts) == 2 and all(len(p) == 3 for p in parts)
    areas = [[w * h for (w, h) in p] for p in parts]
    # coarse scale owns the LARGEST anchors; every coarse area >= every fine
    assert min(areas[0]) >= max(areas[1])
    with pytest.raises(ValueError):
        partition_anchors(ANCHORS6[:5], 2)  # 5 % 2 != 0
    with pytest.raises(ValueError):
        partition_anchors((), 3)


def test_fpn_grid_sizes():
    assert fpn_grid_sizes(13, 3) == (13, 26, 52)
    assert fpn_grid_sizes(7, 2) == (7, 14)


def test_encode_routes_by_anchor_scale():
    """A large GT lands on the coarse grid, a small GT on the fine grid."""
    boxes = jnp.asarray([[0.5, 0.5, 0.8, 0.7, 1.0],    # huge -> coarse
                         [0.25, 0.25, 0.05, 0.06, 2.0]])  # tiny -> fine
    valid = jnp.asarray([True, True])
    grids = encode_fpn_grids(boxes, valid, 3, ANCHORS6, grid=7, num_scales=2)
    assert grids[0].shape == (7, 7, 3 * 8)
    assert grids[1].shape == (14, 14, 3 * 8)
    obj0 = grids[0].reshape(49, 3, 8)[..., 0]
    obj1 = grids[1].reshape(196, 3, 8)[..., 0]
    assert float(obj0.sum()) == 1.0  # exactly the huge box, coarse scale
    assert float(obj1.sum()) == 1.0  # exactly the tiny box, fine scale


def test_encode_decode_roundtrip():
    """decode_fpn_targets(encode_fpn_grids(gt)) reproduces the GT boxes."""
    rng = np.random.RandomState(0)
    n = 6
    boxes = np.zeros((8, 5), np.float32)
    boxes[:n, 0:2] = rng.uniform(0.1, 0.9, (n, 2))
    boxes[:n, 2:4] = rng.uniform(0.05, 0.6, (n, 2))
    boxes[:n, 4] = rng.randint(0, 3, n)
    valid = np.arange(8) < n
    enc = encode_fpn_grids(jnp.asarray(boxes), jnp.asarray(valid), 3,
                           ANCHORS6, grid=7, num_scales=2)
    dec = decode_fpn_targets(tuple(e[None] for e in enc), 3, ANCHORS6,
                             grid=7, num_scales=2)[0]
    got = np.asarray(dec[np.asarray(dec[:, 1]) > 0])
    # cell/anchor collisions may drop boxes; every emitted box must be a GT
    assert len(got) >= 1
    for row in got:
        # match on (class, cx, cy, w, h)
        diffs = np.abs(boxes[:n, 0:4] - row[2:6]).max(axis=1)
        j = int(diffs.argmin())
        assert diffs[j] < 1e-5
        assert boxes[j, 4] == row[0]


def test_decode_pred_activation_semantics():
    """Raw-zero logits decode to cell centers with anchor-sized boxes."""
    parts = partition_anchors(ANCHORS6, 2)
    preds = (jnp.zeros((1, 7, 7, 3 * 8)), jnp.zeros((1, 14, 14, 3 * 8)))
    out = decode_fpn_grids(preds, 3, ANCHORS6, grid=7, num_scales=2)
    assert out.shape == (1, 7 * 7 * 3 + 14 * 14 * 3, 6)
    coarse = np.asarray(out[0, : 49 * 3].reshape(49, 3, 6))
    # sigmoid(0) = 0.5 -> cell centers; exp(0) -> anchor sizes
    assert np.allclose(coarse[0, :, 2], 0.5 / 7, atol=1e-6)
    for a in range(3):
        assert np.allclose(coarse[:, a, 4], parts[0][a][0], atol=1e-6)
    # conf = sigmoid(0) * softmax-uniform-max = 0.5 * 1/3
    assert np.allclose(coarse[..., 1], 0.5 / 3, atol=1e-6)


def test_fpn_head_shapes_and_param_reuse():
    cfg = _fpn_config()
    model = build_model(cfg)
    x = jnp.zeros((2, 56, 56, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x, train=False)
    assert isinstance(outs, tuple) and len(outs) == 2
    assert outs[0].shape == (2, 7, 7, 3 * 8)
    assert outs[1].shape == (2, 14, 14, 3 * 8)
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_fpn_three_scales():
    cfg = _fpn_config(scales=3, anchors=ANCHORS9)
    model = build_model(cfg)
    x = jnp.zeros((1, 56, 56, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(vars_, x, train=False)
    assert [o.shape[1] for o in outs] == [7, 14, 28]
    assert all(o.shape[-1] == 3 * 8 for o in outs)


def test_fpn_validations():
    with pytest.raises(ValueError, match="anchors"):
        build_model(dataclasses.replace(
            _fpn_config(), grid=GridConfig(grid=7, num_classes=3,
                                           anchors=())))
    with pytest.raises(ValueError, match="divisible"):
        build_model(_fpn_config(anchors=ANCHORS6[:5]))
    with pytest.raises(ValueError, match="darknet"):
        cfg = _fpn_config()
        m = build_model(dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone="vgg16")))
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    # multiscale now SUPPORTS fpn (the coarse grid tracks the backbone
    # feature map): stride-aligned sizes validate, misaligned ones raise
    from keras_object_detection_tpu.train.loop import validate_multiscale
    cfg = _fpn_config()
    validate_multiscale(dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       multiscale_sizes=(56, 112))))
    with pytest.raises(ValueError, match="multiple of the backbone"):
        validate_multiscale(dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           multiscale_sizes=(56, 60))))


def test_v3_loss_semantics():
    """Per-scale terms sum; sample_weight zeroes an image's contribution."""
    from keras_object_detection_tpu.losses.yolov3 import yolo_v3_loss_terms

    rng = np.random.RandomState(1)
    boxes = jnp.asarray([[0.5, 0.5, 0.8, 0.7, 1.0],
                         [0.25, 0.25, 0.05, 0.06, 2.0]])
    valid = jnp.asarray([True, True])
    enc = encode_fpn_grids(boxes, valid, 3, ANCHORS6, 7, 2)
    y_true = tuple(jnp.stack([e, e]) for e in enc)  # batch of 2
    y_pred = tuple(  # identical rows, so masking one halves the sums
        jnp.asarray(np.stack([r, r]), jnp.float32)
        for r in (rng.randn(*e.shape) for e in enc))
    terms = yolo_v3_loss_terms(y_true, y_pred, 3, ANCHORS6, 2)
    assert all(bool(jnp.isfinite(v)) for v in terms.values())
    assert float(terms["total"]) == pytest.approx(float(
        terms["box_loss"] + terms["object_loss"]
        + terms["no_object_loss"] + terms["class_loss"]), rel=1e-6)
    # both images identical -> masking one halves every term
    masked = yolo_v3_loss_terms(y_true, y_pred, 3, ANCHORS6, 2,
                                sample_weight=jnp.asarray([1.0, 0.0]))
    assert float(masked["total"]) == pytest.approx(
        0.5 * float(terms["total"]), rel=1e-5)
    with pytest.raises(ValueError, match="per-scale"):
        yolo_v3_loss_terms(y_true[:1], y_pred, 3, ANCHORS6, 2)


def test_map_accumulator_fpn_perfect_predictions():
    """Targets re-encoded as confident predictions score mAP 1.0."""
    from keras_object_detection_tpu.ops.map import MeanAveragePrecision

    boxes = jnp.asarray([[0.5, 0.5, 0.8, 0.7, 0.0],
                         [0.25, 0.25, 0.05, 0.06, 2.0]])
    valid = jnp.asarray([True, True])
    enc = encode_fpn_grids(boxes, valid, 3, ANCHORS6, 7, 2)
    y_true = tuple(e[None] for e in enc)

    # build predictions whose decode matches the targets: logits with
    # sigmoid(tx) = tx*, raw tw = tw*, large obj/class margins on assigned
    def to_pred(t):
        t = t.reshape(t.shape[:-1] + (3, 8))
        obj = jnp.where(t[..., :1] > 0, 12.0, -12.0)
        eps = 1e-6
        xy = jnp.log((t[..., 1:3] + eps) / (1 - t[..., 1:3] + eps))
        wh = t[..., 3:5]
        cls = jnp.where(t[..., 5:] > 0, 12.0, -12.0)
        p = jnp.concatenate([obj, xy, wh, cls], axis=-1)
        return p.reshape(t.shape[:-2] + (3 * 8,))

    y_pred = tuple(to_pred(t) for t in y_true)
    m = MeanAveragePrecision(3, grid=7, anchors=ANCHORS6, fpn_scales=2,
                             conf_threshold=0.4)
    m.update_state(y_true, y_pred)
    # classes 0 and 2 match perfectly; class 1 is absent and reports AP 0
    # (the reference convention, ref utils.py:334) -> mAP = 2/3
    assert m.result() == pytest.approx(2.0 / 3.0, abs=1e-5)


def test_fpn_train_step_learns(tmp_path):
    """A few steps on one fixed batch reduce the fpn loss."""
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_train_step)

    cfg = _fpn_config()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 56, 56, 3)), jnp.uint8)
    boxes = np.zeros((2, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.6, 0.5, 1.0]
    boxes[:, 1] = [0.25, 0.3, 0.08, 0.1, 0.0]
    valid = np.zeros((2, 8), bool)
    valid[:, :2] = True
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, metrics = step(state, images, jnp.asarray(boxes),
                              jnp.asarray(valid), key)
        losses.append(float(metrics["total"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_fpn_trainer_and_evaluator(tmp_path):
    """Trainer.fit + Evaluator round-trip on the reference fixture images."""
    import os
    import shutil

    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.eval.evaluator import Evaluator
    from keras_object_detection_tpu.train.loop import Trainer

    fixture = "/root/reference/yolo_v1/data"
    data = tmp_path / "data"
    data.mkdir()
    for i in range(4):
        shutil.copy(os.path.join(fixture, "test.jpg"), data / f"img{i}.jpg")
        shutil.copy(os.path.join(fixture, "test.txt"), data / f"img{i}.txt")
    cfg = _fpn_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, epochs=2, checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "logs")),
    )
    ds = YoloDataset(str(data), cfg.model.image_size, 2, max_boxes=8,
                     shuffle=True)
    val = YoloDataset(str(data), cfg.model.image_size, 2, max_boxes=8)
    from keras_object_detection_tpu.parallel.mesh import create_mesh
    trainer = Trainer(cfg, mesh=create_mesh(data_parallel=2,
                                            devices=jax.devices()[:2]),
                      use_tensorboard=False)
    state = trainer.fit(ds, val, epochs=2, verbose=False)
    assert int(state.step) == 2 * len(ds)
    ev = Evaluator(cfg)
    out = ev.evaluate(state, val, with_map=True)
    assert np.isfinite(out["loss"]) and 0.0 <= out["mAP"] <= 1.0


def test_yolov3_config_preset():
    """The paper-faithful YOLOv3 preset: Darknet-53 + 3-scale FPN @416,
    the paper's 9 anchors — shape-checked abstractly (no FLOPs)."""
    from keras_object_detection_tpu.config import (YOLOV3_ANCHORS_416,
                                                   yolov3_config)

    cfg = yolov3_config(num_classes=20)
    assert len(YOLOV3_ANCHORS_416) == 9
    assert cfg.grid.grid == 13 and cfg.model.fpn_scales == 3
    assert cfg.train.ignore_threshold == 0.5  # the v3 paper's value
    model = build_model(cfg)
    out = jax.eval_shape(
        lambda x: model.init_with_output(jax.random.PRNGKey(0), x,
                                         train=False)[0],
        jax.ShapeDtypeStruct((1, 416, 416, 3), jnp.float32))
    assert [o.shape[1] for o in out] == [13, 26, 52]
    assert all(o.shape[-1] == 3 * (5 + 20) for o in out)
    # largest anchors (area) live on the coarsest grid — (373,326)/416 first
    parts = partition_anchors(cfg.grid.anchors, 3)
    assert parts[0][0] == (373 / 416, 326 / 416)


def test_darknet53_table_geometry():
    from keras_object_detection_tpu.models.darknet import DARKNET53_CONFIG

    convs = [e for e in DARKNET53_CONFIG
             if not isinstance(e, str) and e[0] != "R"]
    res = [e for e in DARKNET53_CONFIG
           if not isinstance(e, str) and e[0] == "R"]
    # 52 feature convs (the paper's 53rd is its classifier): 6 scalar convs
    # + residual stages 1+2+8+8+4 repeats x 2 convs each
    assert len(convs) == 6
    assert sum(r[2] for r in res) == 23
    assert len(convs) + 2 * sum(r[2] for r in res) == 52
    # downsampling via stride-2 convs only, no pools
    assert not any(isinstance(e, str) for e in DARKNET53_CONFIG)
    assert sum(1 for e in convs if e[2] == 2) == 5  # stride 32


def test_auto_nms_large_candidate_routing():
    """Multi-scale candidate sets above the Pallas kernel's VMEM cap must
    route to the XLA NMS with identical semantics (the 2-scale fpn head
    emits 735 candidates; the single-block kernel measured 23 MB > the
    16 MB scoped-VMEM limit there)."""
    from keras_object_detection_tpu.ops.nms import (
        batched_non_max_suppression)
    from keras_object_detection_tpu.ops.pallas_nms import (
        PALLAS_NMS_MAX_N, auto_batched_non_max_suppression)

    assert PALLAS_NMS_MAX_N < 49 * 3 + 196 * 3  # fpn@grid7 must not fit
    assert PALLAS_NMS_MAX_N >= 49 * 5  # anchor@grid7 B=5 must still fit
    rng = np.random.RandomState(0)
    n = 49 * 3 + 196 * 3
    boxes = np.zeros((2, n, 6), np.float32)
    boxes[..., 0] = rng.randint(0, 3, (2, n))
    boxes[..., 1] = rng.uniform(0, 1, (2, n))
    boxes[..., 2:6] = rng.uniform(0.05, 0.6, (2, n, 4))
    got_b, got_v = auto_batched_non_max_suppression(jnp.asarray(boxes))
    want_b, want_v = batched_non_max_suppression(jnp.asarray(boxes))
    assert np.array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.allclose(np.asarray(got_b), np.asarray(want_b))


def test_inference_model_fpn_predict():
    from keras_object_detection_tpu.eval.evaluator import InferenceModel

    cfg = _fpn_config()
    model = build_model(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
    im = InferenceModel(cfg, vars_["params"], vars_.get("batch_stats", {}))
    img = np.random.RandomState(0).randint(0, 255, (2, 56, 56, 3),
                                           dtype=np.uint8)
    dec = im.predict_decoded(img)
    assert dec.shape == (2, 49 * 3 + 196 * 3, 6)
    boxes, valid = im.predict(img)
    assert boxes.shape[0] == 2 and valid.dtype == bool
    single = im.predict_single(img[0])
    assert single.ndim == 2 and single.shape[1] == 6
