"""Anchor-family (YOLOv2-style) tests — beyond parity (the reference is
anchor-free YOLOv1 only; core/anchors.py, losses/yolov2.py, arXiv:1612.08242):
encode/decode round-trips, best-anchor assignment, loss sanity + masking,
model head shapes, serving integration, end-to-end training, and the k-means
anchor tool."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.core.anchors import (
    decode_anchor_grid, decode_anchor_targets, encode_anchor_grid,
)
from keras_object_detection_tpu.losses.yolov2 import yolo_v2_loss_terms

ANCHORS = ((0.1, 0.15), (0.4, 0.3), (0.8, 0.8))


def _cfg(**kw):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3, anchors=ANCHORS),
        model=ModelConfig(backbone="darknet_micro", head="anchor",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer="adam",
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3), **kw),
        eval=EvalConfig(conf_threshold=0.0),
    )


def _boxes(rows):
    boxes = np.zeros((8, 5), np.float32)
    valid = np.zeros(8, bool)
    for i, r in enumerate(rows):
        boxes[i] = r
        valid[i] = True
    return jnp.asarray(boxes), jnp.asarray(valid)


def test_encode_assigns_best_anchor_and_roundtrips():
    rows = [
        [0.5, 0.5, 0.11, 0.14, 1.0],   # ~anchor 0 shape
        [0.22, 0.81, 0.42, 0.28, 2.0],  # ~anchor 1
        [0.9, 0.1, 0.7, 0.9, 0.0],     # ~anchor 2
    ]
    boxes, valid = _boxes(rows)
    t = encode_anchor_grid(boxes, valid, 3, ANCHORS, grid=7)
    assert t.shape == (7, 7, 3 * 8)
    tt = np.asarray(t).reshape(7, 7, 3, 8)
    # each GT sits in its center cell at its shape-matched anchor slot
    for (cx, cy, w, h, cls), a in zip(rows, (0, 1, 2)):
        col, row = int(7 * cx), int(7 * cy)
        slot = tt[row, col, a]
        assert slot[0] == 1.0, (row, col, a)
        np.testing.assert_allclose(slot[1], 7 * cx - col, atol=1e-5)
        np.testing.assert_allclose(slot[2], 7 * cy - row, atol=1e-5)
        np.testing.assert_allclose(slot[3], np.log(w / ANCHORS[a][0]),
                                   atol=1e-5)
        assert slot[5 + int(cls)] == 1.0
    assert np.asarray(tt[..., 0]).sum() == 3  # exactly 3 assigned slots

    # decode_anchor_targets inverts the encoding exactly
    dec = np.asarray(decode_anchor_targets(t[None], 3, ANCHORS, grid=7))[0]
    kept = dec[dec[:, 1] > 0]
    assert len(kept) == 3
    for cx, cy, w, h, cls in [r[:5] for r in rows]:
        d = kept[np.argmin(np.abs(kept[:, 2] - cx))]
        np.testing.assert_allclose(d[2:6], [cx, cy, w, h], atol=1e-5)
        assert int(d[0]) == int(cls)


def test_pred_decode_matches_activation_math():
    """Hand-build raw predictions whose activations decode to a known box."""
    nb, c, s = len(ANCHORS), 3, 7
    p = np.zeros((1, s, s, nb, 5 + c), np.float32)
    # slot (row 2, col 3, anchor 1): obj logit 2.0, tx=ty=0 (sigmoid 0.5),
    # tw = log(0.5) => w = 0.4 * 0.5 = 0.2; class 2 dominant
    p[0, 2, 3, 1, 0] = 2.0
    p[0, 2, 3, 1, 3] = np.log(0.5)
    p[0, 2, 3, 1, 4] = np.log(2.0)
    p[0, 2, 3, 1, 5 + 2] = 10.0
    dec = np.asarray(decode_anchor_grid(
        jnp.asarray(p.reshape(1, s, s, nb * (5 + c))), c, ANCHORS, s))
    assert dec.shape == (1, s * s * nb, 6)
    idx = (2 * s + 3) * nb + 1
    d = dec[0, idx]
    sig2 = 1 / (1 + np.exp(-2.0))
    np.testing.assert_allclose(d[1], sig2 * (np.exp(10.0) / (np.exp(10.0)
                               + (c - 1))), rtol=1e-4)
    np.testing.assert_allclose(d[2], (0.5 + 3) / s, atol=1e-6)
    np.testing.assert_allclose(d[3], (0.5 + 2) / s, atol=1e-6)
    np.testing.assert_allclose(d[4], 0.4 * 0.5, atol=1e-6)
    np.testing.assert_allclose(d[5], 0.3 * 2.0, atol=1e-6)
    assert int(d[0]) == 2


def test_loss_zero_at_perfect_prediction_limit():
    """A prediction whose activations exactly reproduce the target drives
    coord/class terms to ~0 (obj terms can't hit 0 with finite logits —
    check they shrink monotonically with logit magnitude)."""
    boxes, valid = _boxes([[0.5, 0.5, 0.4, 0.3, 1.0]])
    t = encode_anchor_grid(boxes, valid, 3, ANCHORS, grid=7)[None]
    tt = np.asarray(t).reshape(1, 7, 7, 3, 8)

    def build_pred(big):
        p = np.zeros_like(tt)
        obj = tt[..., 0] > 0
        # invert activations: logit(tx*), raw tw*, class logits
        x = np.clip(tt[..., 1:3], 1e-4, 1 - 1e-4)
        p[..., 1:3] = np.where(obj[..., None], np.log(x / (1 - x)), 0.0)
        p[..., 3:5] = np.where(obj[..., None], tt[..., 3:5], 0.0)
        p[..., 0] = np.where(obj, big, -big)
        p[..., 5:] = np.where(obj[..., None],
                              (tt[..., 5:] * 2 - 1) * big, 0.0)
        return jnp.asarray(p.reshape(t.shape))

    t10 = yolo_v2_loss_terms(t, build_pred(10.0), 3, ANCHORS)
    t20 = yolo_v2_loss_terms(t, build_pred(20.0), 3, ANCHORS)
    assert float(t10["box_loss"]) < 1e-6
    assert float(t20["class_loss"]) < 1e-6
    assert float(t20["object_loss"]) < float(t10["object_loss"]) < 1e-6
    assert float(t20["no_object_loss"]) < float(t10["no_object_loss"])


def test_loss_sample_weight_masks_images():
    boxes, valid = _boxes([[0.5, 0.5, 0.4, 0.3, 1.0]])
    t1 = encode_anchor_grid(boxes, valid, 3, ANCHORS, grid=7)
    t = jnp.stack([t1, t1])
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.normal(size=t.shape).astype(np.float32))
    full = yolo_v2_loss_terms(t, p, 3, ANCHORS)
    half = yolo_v2_loss_terms(t, p, 3, ANCHORS,
                              sample_weight=jnp.asarray([1.0, 0.0]))
    one = yolo_v2_loss_terms(t[:1], p[:1], 3, ANCHORS)
    np.testing.assert_allclose(float(half["total"]), float(one["total"]),
                               rtol=1e-5)
    assert float(full["total"]) > float(half["total"])


def test_anchor_model_and_serving_shapes():
    from keras_object_detection_tpu.eval.evaluator import InferenceModel
    from keras_object_detection_tpu.train.loop import create_train_state

    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    m = InferenceModel(cfg, jax.device_get(state.params),
                       jax.device_get(state.batch_stats))
    imgs = np.random.RandomState(0).randint(0, 256, (2, 56, 56, 3),
                                            dtype=np.uint8)
    raw = np.asarray(m.predict_raw(imgs))
    assert raw.shape == (2, 7, 7, 3 * 8)
    dec = np.asarray(m.predict_decoded(imgs))
    assert dec.shape == (2, 7 * 7 * 3, 6)
    assert np.isfinite(dec).all()
    boxes, valid = m.predict(imgs)
    assert boxes.shape[0] == 2 and valid.dtype == bool


def test_anchor_head_requires_anchors():
    cfg = _cfg()
    cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
        cfg.grid, anchors=()))
    from keras_object_detection_tpu.train.loop import create_train_state
    with pytest.raises(ValueError, match="requires GridConfig.anchors"):
        create_train_state(cfg, jax.random.PRNGKey(0))


def test_anchor_guards():
    from keras_object_detection_tpu.train.loop import make_train_step
    with pytest.raises(ValueError, match="implements the v1 loss"):
        make_train_step(_cfg(use_pallas_loss=True))
    with pytest.raises(ValueError, match="box terms are fixed"):
        make_train_step(_cfg(box_loss_mode="ciou"))


def test_anchor_int8_serving_constructs():
    """Round 3 extended true-int8 serving to the anchor head (same ConvHead
    fold, export/int8_serving.py): the Int8InferenceModel must BUILD for the
    anchor family and produce finite decoded boxes in the anchor layout."""
    from keras_object_detection_tpu.export.int8_serving import (
        Int8InferenceModel)
    from keras_object_detection_tpu.train.loop import create_train_state
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    m = Int8InferenceModel(cfg, jax.device_get(state.params),
                           jax.device_get(state.batch_stats))
    imgs = np.random.RandomState(0).randint(
        0, 255, size=(2, 56, 56, 3), dtype=np.uint8)
    dec = np.asarray(m.predict_decoded(imgs))
    assert dec.shape == (2, 7 * 7 * len(ANCHORS), 6)
    assert np.isfinite(dec).all()


def test_anchor_training_end_to_end(tmp_path):
    """Trainer.fit with the anchor head: losses finite and falling, the
    anchor-aware mAP accumulator runs on the val pass, checkpoints save."""
    import json
    import os
    import shutil

    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.parallel.mesh import create_mesh
    from keras_object_detection_tpu.train.loop import Trainer

    data = tmp_path / "d"
    data.mkdir()
    for i in range(2):
        shutil.copy("/root/reference/yolo_v1/data/test.jpg",
                    data / f"i{i}.jpg")
        shutil.copy("/root/reference/yolo_v1/data/test.txt",
                    data / f"i{i}.txt")
    cfg = _cfg(epochs=12, checkpoint_dir=str(tmp_path / "ckpt"),
               log_dir=str(tmp_path / "logs"),
               map_eval_start_epoch=0, map_eval_every=1)
    # identity augmentation: the 2-image loss trend is then near-monotone
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, hflip_prob=0.0, color_jitter=(0.0,) * 4,
            crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0)),
        model=dataclasses.replace(cfg.model, dropout_rate=0.0))
    ds = YoloDataset(str(data), cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8, cache_in_memory=True)
    tr = Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                       devices=jax.devices()[:1]),
                 use_tensorboard=False)
    state = tr.fit(ds, ds, state=tr.init_state(), verbose=False)
    tr.ckpt.close()
    rows = [json.loads(l)
            for l in open(os.path.join(cfg.train.log_dir, "train.jsonl"))]
    assert len(rows) == 12
    assert all(np.isfinite(r["total"]) for r in rows)
    # adam on a 2-image batch is noisy early; the TREND must be down
    # (observed: [101, 1111, 79, ..., 7.6, 22.5])
    assert min(r["total"] for r in rows[-3:]) < 0.5 * rows[0]["total"]
    assert any("val_mAP" in r for r in rows)  # anchor-aware accumulator ran
    assert 0.0 <= max(r.get("val_mAP", 0.0) for r in rows) <= 1.0


def test_anchor_composes_with_multiscale_and_mosaic(tmp_path):
    """The anchor head trains across multiscale resolutions with mosaic and
    mixup on — every recipe feature composes inside the one jitted step."""
    import json
    import os
    import shutil

    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.parallel.mesh import create_mesh
    from keras_object_detection_tpu.train.loop import Trainer, multiscale_grid

    cfg = _cfg(epochs=3, checkpoint_dir=str(tmp_path / "ckpt"),
               log_dir=str(tmp_path / "logs"),
               multiscale_sizes=(48, 56), multiscale_every=1)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, mosaic_prob=0.5, mixup_prob=0.5))
    assert multiscale_grid(cfg, 48) == 6  # anchor head follows the conv path

    data = tmp_path / "d"
    data.mkdir()
    for i in range(2):
        shutil.copy("/root/reference/yolo_v1/data/test.jpg",
                    data / f"i{i}.jpg")
        shutil.copy("/root/reference/yolo_v1/data/test.txt",
                    data / f"i{i}.txt")
    ds = YoloDataset(str(data), cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=8, cache_in_memory=True)
    tr = Trainer(cfg, mesh=create_mesh(data_parallel=1,
                                       devices=jax.devices()[:1]),
                 use_tensorboard=False)
    state = tr.fit(ds, None, state=tr.init_state(), verbose=False)
    tr.ckpt.close()
    rows = [json.loads(l)
            for l in open(os.path.join(cfg.train.log_dir, "train.jsonl"))]
    assert len(rows) == 3
    assert all(np.isfinite(r["total"]) for r in rows)
    assert {r["train_size"] for r in rows} == {48, 56}


def test_kmeans_anchor_tool_logic():
    import sys
    sys.path.insert(0, "tools")
    from kmeans_anchors import kmeans_iou

    rng = np.random.RandomState(0)
    # 3 tight wh clusters -> k-means must find centroids near each
    truth = np.array([[0.1, 0.12], [0.4, 0.3], [0.8, 0.75]])
    wh = np.concatenate([
        t + rng.uniform(-0.01, 0.01, (200, 2)) for t in truth])
    anchors, avg_iou = kmeans_iou(wh.astype(np.float32), 3, seed=1)
    assert avg_iou > 0.9
    for t in truth:
        assert np.abs(anchors - t).sum(axis=1).min() < 0.05
