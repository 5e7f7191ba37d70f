"""AdamW / SGDW decoupled weight decay (beyond parity; arXiv:1711.05101 —
the reference never regularizes, ref train.py:114): decay actually shrinks
weights relative to the undecayed twin, zero decay matches the base
optimizer, and the LR stays injectable (schedules still work)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, ScheduleConfig, TrainConfig,
)
from keras_object_detection_tpu.train.loop import (
    create_train_state, make_train_step, set_learning_rate,
)


def _cfg(optimizer, wd):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer=optimizer, weight_decay=wd,
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
    )


def _one_step(cfg):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (2, 56, 56, 3), dtype=np.uint8))
    boxes = np.zeros((2, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.3, 1.0]
    valid = np.zeros((2, 8), bool)
    valid[:, 0] = True
    new_state, metrics = step(state, imgs, jnp.asarray(boxes),
                              jnp.asarray(valid), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total"]))
    return jax.device_get(new_state.params)


def _norm(params):
    return float(sum(float(jnp.sum(jnp.square(l)))
                     for l in jax.tree_util.tree_leaves(params)) ** 0.5)


@pytest.mark.parametrize("optimizer,base", [("adamw", "adam"),
                                            ("sgdw", None)])
def test_decay_shrinks_weights(optimizer, base):
    decayed = _one_step(_cfg(optimizer, 0.5))
    undecayed = _one_step(_cfg(optimizer, 0.0))
    assert _norm(decayed) < _norm(undecayed)
    if base is not None:
        # zero decay reproduces the base optimizer exactly
        plain = _one_step(_cfg(base, 0.0))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
            undecayed, plain)


def test_lr_stays_injectable():
    cfg = _cfg("adamw", 1e-4)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = set_learning_rate(state, 5e-4)
    assert float(state.opt_state.hyperparams["learning_rate"]) \
        == pytest.approx(5e-4)


def test_unknown_optimizer_rejected():
    with pytest.raises(ValueError, match="unknown optimizer"):
        create_train_state(_cfg("rmsprop", 0.0), jax.random.PRNGKey(0))
