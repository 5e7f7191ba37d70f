"""Checkpoint averaging (train/checkpoint.py average_checkpoints, beyond
parity — the reference serves one best checkpoint, ref train.py:150-157):
uniform param mean, last_k selection, newest-state bookkeeping, and the
ema/batch_stats handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, ScheduleConfig, TrainConfig,
)
from keras_object_detection_tpu.train.checkpoint import (
    CheckpointManager, average_checkpoints,
)
from keras_object_detection_tpu.train.loop import create_train_state


def _cfg(ema=None):
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8),
        train=TrainConfig(optimizer="sgd", ema_decay=ema,
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
    )


def _fill(state, value):
    """All param/stat/ema leaves set to a constant, step stamped."""
    const = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, value), t)
    kw = dict(params=const(state.params),
              batch_stats=const(state.batch_stats),
              step=jnp.asarray(int(value * 10)))
    if state.ema_params is not None:
        kw["ema_params"] = const(state.ema_params)
    return state.replace(**kw)


@pytest.mark.parametrize("ema", [None, 0.99])
def test_average_checkpoints_uniform_mean(tmp_path, ema):
    cfg = _cfg(ema=ema)
    template = jax.device_get(create_train_state(cfg, jax.random.PRNGKey(0)))
    mgr = CheckpointManager(str(tmp_path), max_to_keep=5)
    for epoch, v in enumerate([1.0, 2.0, 6.0], start=1):
        mgr.save(epoch, _fill(template, v), {"val_loss": 10.0 - v})
    mgr.wait()
    assert mgr.all_steps == [1, 2, 3]

    avg = average_checkpoints(mgr, template)
    for leaf in jax.tree_util.tree_leaves(avg.params):
        np.testing.assert_allclose(leaf, 3.0, rtol=1e-6)  # mean(1, 2, 6)
    for leaf in jax.tree_util.tree_leaves(avg.batch_stats):
        np.testing.assert_allclose(leaf, 3.0, rtol=1e-6)
    if ema is not None:
        for leaf in jax.tree_util.tree_leaves(avg.ema_params):
            np.testing.assert_allclose(leaf, 3.0, rtol=1e-6)
    # non-averaged bookkeeping comes from the NEWEST checkpoint
    assert int(avg.step) == 60

    last2 = average_checkpoints(mgr, template, last_k=2)
    for leaf in jax.tree_util.tree_leaves(last2.params):
        np.testing.assert_allclose(leaf, 4.0, rtol=1e-6)  # mean(2, 6)
    mgr.close()


def test_average_checkpoints_empty_raises(tmp_path):
    cfg = _cfg()
    template = jax.device_get(create_train_state(cfg, jax.random.PRNGKey(0)))
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        average_checkpoints(mgr, template)
    mgr.close()
