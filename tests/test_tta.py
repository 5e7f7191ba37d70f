"""Serving-path test-time augmentation (EvalConfig.tta="hflip", beyond
parity — the reference serves one forward per image, ref evaluate.py:24-28):
candidate-set shape, mirror symmetry of the TTA union, default-off parity,
and the NMS-merged predict path."""

import dataclasses

import jax
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig,
)
from keras_object_detection_tpu.eval.evaluator import InferenceModel
from keras_object_detection_tpu.train.loop import create_train_state


def _cfg(tta="hflip"):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        eval=EvalConfig(conf_threshold=0.0, tta=tta),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    return cfg, params, stats, imgs


def test_tta_doubles_candidates_and_mirror_symmetry(setup):
    cfg, params, stats, imgs = setup
    m = InferenceModel(cfg, params, stats)
    dec = np.asarray(m.predict_decoded(imgs))
    assert dec.shape == (2, 2 * 49, 6)

    # TTA union is mirror-equivariant: predict(flip(x)) must equal
    # predict(x) with cx -> 1-cx, as SETS of boxes. With the hflip TTA the
    # two halves swap roles, so compare sorted rows.
    dec_f = np.asarray(m.predict_decoded(imgs[:, :, ::-1, :]))
    mirrored = dec.copy()
    mirrored[..., 2] = 1.0 - mirrored[..., 2]
    for b in range(2):
        a = np.sort(dec_f[b], axis=0)
        c = np.sort(mirrored[b], axis=0)
        np.testing.assert_allclose(a, c, atol=1e-5)


def test_tta_none_is_reference_path(setup):
    cfg, params, stats, imgs = setup
    m0 = InferenceModel(dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, tta="none")), params, stats)
    dec = np.asarray(m0.predict_decoded(imgs))
    assert dec.shape == (2, 49, 6)
    # the TTA union's first half IS the plain forward's decode
    m1 = InferenceModel(cfg, params, stats)
    dec_tta = np.asarray(m1.predict_decoded(imgs))
    np.testing.assert_allclose(dec_tta[:, :49], dec, atol=1e-6)


def test_tta_predict_nms_merges(setup):
    cfg, params, stats, imgs = setup
    m = InferenceModel(cfg, params, stats)
    boxes, valid = m.predict(imgs)
    assert boxes.shape[0] == 2 and boxes.shape[2] == 6
    assert valid.dtype == bool
    # kept boxes are finite (an untrained net's raw cx/cy are unbounded —
    # decode_grid does not clip, so no range assertion here)
    kept = boxes[0][valid[0]]
    assert np.isfinite(kept).all()
    # the TTA union gives NMS 98 candidates; suppression must still act
    assert valid.sum() <= 2 * 98


def test_tta_int8_path_honors_config(setup):
    """EvalConfig.tta must not be silently dropped on the int8 serving path
    (evaluate.py --tta hflip --serving int8): candidate count doubles and
    the union's first half is the plain int8 decode."""
    from keras_object_detection_tpu.export.int8_serving import (
        Int8InferenceModel)

    cfg, params, stats, imgs = setup
    m = Int8InferenceModel(cfg, params, stats)
    dec = np.asarray(m.predict_decoded(imgs))
    assert dec.shape == (2, 2 * 49, 6)
    m0 = Int8InferenceModel(dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, tta="none")), params, stats)
    plain = np.asarray(m0.predict_decoded(imgs))
    np.testing.assert_allclose(dec[:, :49], plain, atol=1e-6)


def test_tta_unknown_mode_rejected(setup):
    cfg, params, stats, _ = setup
    bad = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, tta="vflip"))
    with pytest.raises(ValueError, match="unknown EvalConfig.tta"):
        InferenceModel(bad, params, stats).predict_decoded(
            np.zeros((1, 56, 56, 3), np.uint8))
