"""Tests for the parity-widening variants: test_model preset, remat,
MeanAveragePrecision2 semantics, multi-host data sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.config import test_model_config as make_test_model_cfg
from keras_object_detection_tpu.models.yolo import YoloV1, build_model
from keras_object_detection_tpu.ops.map import MeanAveragePrecision


def test_test_model_preset_shapes():
    cfg = make_test_model_cfg()
    m = build_model(cfg)
    assert m.head_batchnorm is False and m.head_dense_units == 4096
    x = jnp.zeros((1, 448, 448, 3), jnp.float32)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, train=False))
    out = jax.eval_shape(lambda vv: m.apply(vv, x, train=False), v)
    assert out.shape == (1, 7, 7, 30)
    # no BN params in the head's dense stack
    head_params = v["params"]["GAPDenseHead_0"]
    assert not any("BatchNorm" in k for k in head_params.keys())


def test_remat_train_step_matches_plain(tmp_path):
    """remat=True (jax.checkpoint around the forward in the train step) must
    produce the same loss/metrics as the plain step, with identical param
    naming (checkpoint-compatible)."""
    import dataclasses

    from keras_object_detection_tpu.config import (
        DataConfig, ScheduleConfig, TrainConfig)
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

    base = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer="adam",
                          schedule=ScheduleConfig(kind="constant")),
    )
    rcfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, remat=True))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 224, 224, 3), dtype=np.uint8))
    boxes = jnp.zeros((2, 8, 5))
    valid = jnp.zeros((2, 8), bool)
    key = jax.random.PRNGKey(1)

    dcfg = dataclasses.replace(
        base, model=dataclasses.replace(base.model, remat=True,
                                        remat_policy="dots"))

    s1 = create_train_state(base, jax.random.PRNGKey(0))
    new1, m1 = jax.jit(make_train_step(base))(s1, images, boxes, valid, key)
    leaf1 = np.asarray(jax.tree_util.tree_leaves(new1.params)[0])
    for cfg in (rcfg, dcfg):
        s2 = create_train_state(cfg, jax.random.PRNGKey(0))
        new2, m2 = jax.jit(make_train_step(cfg))(s2, images, boxes, valid, key)
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                                   rtol=1e-5)
        # gradients (hence the updated params) must match too — remat only
        # changes WHEN activations are computed, not the math
        leaf2 = np.asarray(jax.tree_util.tree_leaves(new2.params)[0])
        np.testing.assert_allclose(leaf1, leaf2, rtol=1e-4, atol=1e-6)


def test_map_variant2_no_nms_on_targets():
    """nms_on_targets=False (ref metric.py:81 MeanAveragePrecision2): two
    overlapping same-class GT cells are BOTH kept as targets, unlike the
    default where NMS merges them."""
    c = 3
    y_true = np.zeros((1, 7, 7, 13), np.float32)
    # two adjacent cells, same class, nearly identical decoded boxes
    for (i, j, x_off) in [(3, 3, 0.99), (3, 4, 0.01)]:
        y_true[0, i, j, 1] = 1
        y_true[0, i, j, c] = 1
        y_true[0, i, j, c + 1 : c + 5] = [x_off, 0.5, 0.3, 0.3]
    # ONE confident prediction covering the merged box: the default (GTs
    # NMS-merged to one) scores full recall -> AP 1; variant 2 keeps both
    # GTs -> recall 1/2 -> AP 0.5.
    y_pred = y_true.copy()
    y_pred[0, 3, 4] = 0.0  # drop the second cell's prediction
    y_pred[..., c] *= 0.9

    m_default = MeanAveragePrecision(c)
    m_default.update_state(y_true, y_pred)
    m_v2 = MeanAveragePrecision(c, nms_on_targets=False)
    m_v2.update_state(y_true, y_pred)
    assert np.isclose(m_default.result(), 1.0 / c, atol=1e-3)
    assert np.isclose(m_v2.result(), 0.5 / c, atol=1e-3)


def test_dataset_sharding(tmp_path):
    import shutil

    for i in range(6):
        shutil.copy("/root/reference/yolo_v1/data/test.jpg",
                    tmp_path / f"i{i}.jpg")
        shutil.copy("/root/reference/yolo_v1/data/test.txt",
                    tmp_path / f"i{i}.txt")
    from keras_object_detection_tpu.data.pipeline import YoloDataset

    s0 = YoloDataset(str(tmp_path), 64, 1, shard_index=0, shard_count=2)
    s1 = YoloDataset(str(tmp_path), 64, 1, shard_index=1, shard_count=2)
    assert s0.num_examples == 3 and s1.num_examples == 3
    assert set(s0.paths) | set(s1.paths) == set(
        YoloDataset(str(tmp_path), 64, 1).paths)
    assert not set(s0.paths) & set(s1.paths)
