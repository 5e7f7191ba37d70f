"""Soft-NMS (opt-in, beyond parity — the reference only has hard greedy NMS,
ref utils.py:79-149): the static-shape fori_loop implementation must match an
independent numpy oracle of the Bodla et al. class-aware decay algorithm, and
degenerate cases must reduce to the hard keep set."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.core.boxes import pairwise_iou_cxcywh
from keras_object_detection_tpu.ops.nms import (
    batched_soft_non_max_suppression,
    non_max_suppression,
    soft_non_max_suppression,
)


def _oracle(boxes, iou_threshold, conf_threshold, sigma, method):
    """Greedy soft-NMS in plain numpy (IoU values taken from the shared
    quirk-exact pairwise op so this tests only the selection/decay loop)."""
    boxes = np.asarray(boxes, np.float32)
    n = len(boxes)
    iou = np.asarray(
        pairwise_iou_cxcywh(jnp.asarray(boxes[:, 2:6]),
                            jnp.asarray(boxes[:, 2:6])))
    conf = boxes[:, 1].astype(np.float32).copy()
    remaining = list(range(n))
    kept = []
    while remaining:
        j = max(remaining, key=lambda k: (conf[k], -k))  # first-max ties
        if not conf[j] > conf_threshold:
            break
        kept.append((j, conf[j]))
        remaining.remove(j)
        for k in remaining:
            if boxes[k, 0] == boxes[j, 0]:
                if method == "gaussian":
                    conf[k] = np.float32(
                        conf[k] * np.exp(-(iou[j, k] ** 2) / np.float32(sigma)))
                elif iou[j, k] >= iou_threshold:
                    conf[k] = np.float32(conf[k] * (1.0 - iou[j, k]))
    return kept


def _run(boxes, **kw):
    out, valid = soft_non_max_suppression(jnp.asarray(boxes), **kw)
    out, valid = np.asarray(out), np.asarray(valid)
    return out[valid]


def test_soft_nms_matches_oracle_fuzz():
    for seed in range(4):
        rng = np.random.RandomState(seed)
        boxes = rng.uniform(0, 1, size=(49, 6)).astype(np.float32)
        boxes[:, 0] = rng.randint(0, 3, size=49)
        boxes[:, 4:6] = rng.uniform(0.05, 0.5, size=(49, 2))
        for method in ("gaussian", "linear"):
            got = _run(boxes, iou_threshold=0.4, conf_threshold=0.3,
                       sigma=0.5, method=method)
            exp = _oracle(boxes, 0.4, 0.3, 0.5, method)
            assert len(got) == len(exp), (seed, method)
            for row, (j, c) in zip(got, exp):
                np.testing.assert_allclose(row[[0, 2, 3, 4, 5]],
                                           boxes[j][[0, 2, 3, 4, 5]],
                                           rtol=1e-6)
                np.testing.assert_allclose(row[1], c, rtol=1e-4, atol=1e-6)


def test_soft_gaussian_recovers_crowded_pair():
    # Two same-class boxes, IoU ~0.58: hard NMS deletes the weaker, gaussian
    # soft-NMS keeps it with decayed confidence exp(-iou^2/sigma)*conf.
    boxes = jnp.asarray(
        [[0.0, 0.95, 0.50, 0.50, 0.30, 0.30],
         [0.0, 0.90, 0.66, 0.50, 0.30, 0.30]], dtype=jnp.float32)
    iou = float(pairwise_iou_cxcywh(boxes[:1, 2:6], boxes[1:, 2:6])[0, 0])
    assert iou > 0.5  # sanity: hard NMS would suppress
    hard, hv = non_max_suppression(boxes, iou_threshold=0.5)
    assert np.asarray(hv).sum() == 1
    kept = _run(boxes, iou_threshold=0.5, conf_threshold=0.4,
                sigma=0.5, method="gaussian")
    decayed = 0.90 * np.exp(-iou**2 / 0.5)
    assert decayed > 0.4  # the recovered detection clears the filter
    assert len(kept) == 2
    np.testing.assert_allclose(kept[1, 1], decayed, rtol=1e-5)


def test_soft_linear_equals_hard_when_no_overlap():
    # Disjoint boxes: linear decay never triggers below iou_threshold, so the
    # keep set equals hard NMS's (everything above the confidence filter).
    boxes = jnp.asarray(
        [[0.0, 0.9, 0.15, 0.15, 0.1, 0.1],
         [0.0, 0.8, 0.50, 0.50, 0.1, 0.1],
         [1.0, 0.7, 0.85, 0.85, 0.1, 0.1],
         [0.0, 0.3, 0.85, 0.15, 0.1, 0.1]], dtype=jnp.float32)  # conf-filtered
    soft = _run(boxes, iou_threshold=0.5, conf_threshold=0.4,
                sigma=0.5, method="linear")
    hard, hv = non_max_suppression(boxes, iou_threshold=0.5)
    hard = np.asarray(hard)[np.asarray(hv)]
    np.testing.assert_allclose(soft, hard, rtol=1e-6)


def test_soft_nms_static_shapes_and_empty():
    import jax

    fn = jax.jit(lambda b: soft_non_max_suppression(b, method="gaussian"))
    out, valid = fn(jnp.zeros((49, 6), jnp.float32))
    assert out.shape == (49, 6) and valid.shape == (49,)
    assert not bool(np.asarray(valid).any())
    # padded (invalid) rows are zeroed, not garbage
    assert float(np.abs(np.asarray(out)).sum()) == 0.0


def test_batched_soft_matches_single():
    rng = np.random.RandomState(7)
    batch = rng.uniform(0, 1, size=(3, 49, 6)).astype(np.float32)
    batch[..., 0] = rng.randint(0, 3, size=(3, 49))
    out_b, valid_b = batched_soft_non_max_suppression(jnp.asarray(batch))
    for i in range(3):
        out_s, valid_s = soft_non_max_suppression(jnp.asarray(batch[i]))
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_s),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(valid_b[i]),
                                      np.asarray(valid_s))


def test_inference_model_soft_nms_plumbing():
    """EvalConfig.nms_mode='soft_gaussian' routes the fused serving graph
    through soft-NMS (decayed confidences can keep crowded boxes)."""
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

    soft_cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, nms_mode="soft_gaussian"))
    soft = InferenceModel(soft_cfg, state.params, state.batch_stats)
    boxes, valid = soft.predict(img)
    n = cfg.grid.grid * cfg.grid.grid
    assert boxes.shape == (1, n, 6) and valid.shape == (1, n)

    # parity of the keep DECISIONS with a host-side soft-NMS on the decoded
    # output of the plain float path
    plain = InferenceModel(cfg, state.params, state.batch_stats)
    decoded = plain.predict_decoded(img)
    exp_boxes, exp_valid = soft_non_max_suppression(
        decoded[0], cfg.eval.iou_threshold, cfg.eval.conf_threshold,
        cfg.eval.soft_nms_sigma, "gaussian")
    np.testing.assert_array_equal(valid[0], np.asarray(exp_valid))
    np.testing.assert_allclose(boxes[0], np.asarray(exp_boxes),
                               rtol=1e-5, atol=1e-6)
