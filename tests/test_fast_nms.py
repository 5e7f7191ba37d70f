"""Fast NMS (one-shot matrix suppression, YOLACT arXiv:1904.02689 §3.5 —
opt-in, beyond parity; the reference only has hard greedy NMS, ref
utils.py:79-149). Pins the relaxation's exact semantics: the kept set is
always a SUBSET of greedy's, equal when no suppression is transitive."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.core.boxes import pairwise_iou_cxcywh
from keras_object_detection_tpu.ops.nms import (
    batched_fast_non_max_suppression,
    fast_non_max_suppression,
    non_max_suppression,
)


def _oracle(boxes, iou_threshold, conf_threshold):
    """Fast NMS in plain numpy: suppressed by ANY conf-passing
    higher-ranked same-class box with IoU >= threshold."""
    boxes = np.asarray(boxes, np.float32)
    order = np.argsort(-boxes[:, 1], kind="stable")
    sb = boxes[order]
    iou = np.asarray(pairwise_iou_cxcywh(jnp.asarray(sb[:, 2:6]),
                                         jnp.asarray(sb[:, 2:6])))
    alive = sb[:, 1] > conf_threshold
    keep = alive.copy()
    n = len(sb)
    for j in range(n):
        for i in range(j):
            if (alive[i] and sb[i, 0] == sb[j, 0]
                    and iou[i, j] >= iou_threshold):
                keep[j] = False
    return sb[keep]


def _run(fn, boxes, **kw):
    out, valid = fn(jnp.asarray(boxes), **kw)
    return np.asarray(out)[np.asarray(valid)]


def test_fast_nms_matches_oracle_fuzz():
    for seed in range(6):
        rng = np.random.RandomState(seed)
        boxes = rng.uniform(0, 1, size=(49, 6)).astype(np.float32)
        boxes[:, 0] = rng.randint(0, 3, size=49)
        boxes[:, 4:6] = rng.uniform(0.05, 0.5, size=(49, 2))
        got = _run(fast_non_max_suppression, boxes,
                   iou_threshold=0.4, conf_threshold=0.3)
        want = _oracle(boxes, 0.4, 0.3)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fast_keep_set_is_subset_of_greedy():
    for seed in range(6):
        rng = np.random.RandomState(100 + seed)
        boxes = rng.uniform(0, 1, size=(32, 6)).astype(np.float32)
        boxes[:, 0] = rng.randint(0, 2, size=32)
        boxes[:, 4:6] = rng.uniform(0.1, 0.6, size=(32, 2))
        fast = _run(fast_non_max_suppression, boxes)
        greedy = _run(non_max_suppression, boxes)

        def rows(a):
            return {tuple(np.round(r, 6)) for r in a}

        assert rows(fast) <= rows(greedy)


def test_fast_over_suppresses_transitive_chain():
    """A > B > C same class; IoU(A,B) and IoU(B,C) above threshold but
    IoU(A,C) below: greedy keeps A and C (B's suppression frees C); Fast
    NMS kills C too because the dead B still suppresses."""
    boxes = np.array([
        # cls conf cx    cy   w    h   — under the shared quirk IoU
        # (core/boxes.py (c±s)/2 corners): IoU(A,B)=IoU(B,C)=0.667,
        # IoU(A,C)=0.429
        [0.0, 0.9, 0.30, 0.5, 0.20, 0.2],   # A
        [0.0, 0.8, 0.38, 0.5, 0.20, 0.2],   # B
        [0.0, 0.7, 0.46, 0.5, 0.20, 0.2],   # C
    ], np.float32)
    greedy = _run(non_max_suppression, boxes,
                  iou_threshold=0.5, conf_threshold=0.3)
    fast = _run(fast_non_max_suppression, boxes,
                iou_threshold=0.5, conf_threshold=0.3)
    assert len(greedy) == 2 and len(fast) == 1
    np.testing.assert_allclose(fast[0], boxes[0])


def test_sub_threshold_boxes_never_suppress():
    boxes = np.array([
        [0.0, 0.2, 0.5, 0.5, 0.3, 0.3],   # below conf threshold
        [0.0, 0.6, 0.5, 0.5, 0.3, 0.3],   # identical box, above
    ], np.float32)
    fast = _run(fast_non_max_suppression, boxes,
                iou_threshold=0.5, conf_threshold=0.4)
    assert len(fast) == 1 and fast[0, 1] == np.float32(0.6)


def test_batched_matches_single_and_shapes():
    rng = np.random.RandomState(7)
    boxes = rng.uniform(0, 1, size=(3, 20, 6)).astype(np.float32)
    boxes[..., 0] = rng.randint(0, 3, size=(3, 20))
    out, valid = batched_fast_non_max_suppression(jnp.asarray(boxes))
    assert out.shape == (3, 20, 6) and valid.shape == (3, 20)
    for b in range(3):
        single, sv = fast_non_max_suppression(jnp.asarray(boxes[b]))
        np.testing.assert_array_equal(np.asarray(valid[b]), np.asarray(sv))
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(single))


def test_inference_model_fast_nms_plumbing():
    """EvalConfig.nms_mode='fast' routes fused serving through Fast NMS."""
    import jax

    from keras_object_detection_tpu.config import (Config, DataConfig,
                                                   GridConfig, ModelConfig)
    from keras_object_detection_tpu.eval.evaluator import InferenceModel
    from keras_object_detection_tpu.train.loop import create_train_state

    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=1, max_boxes_per_image=4),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    img = np.random.RandomState(0).randint(0, 255, (1, 56, 56, 3), np.uint8)

    fast_cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, nms_mode="fast"))
    fm = InferenceModel(fast_cfg, state.params, state.batch_stats)
    boxes, valid = fm.predict(img)
    n = cfg.grid.grid * cfg.grid.grid
    assert boxes.shape == (1, n, 6) and valid.shape == (1, n)

    plain = InferenceModel(cfg, state.params, state.batch_stats)
    decoded = plain.predict_decoded(img)
    exp_boxes, exp_valid = fast_non_max_suppression(
        decoded[0], cfg.eval.iou_threshold, cfg.eval.conf_threshold)
    np.testing.assert_array_equal(valid[0], np.asarray(exp_valid))
    np.testing.assert_allclose(boxes[0], np.asarray(exp_boxes),
                               rtol=1e-5, atol=1e-6)
