"""Model summary (parity target: the reference's ``model.summary()`` /
``YoloV1.build_graph()`` inspection surface, ref model.py:273-305)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.models.yolo import build_model


def summarize(config: Config, depth: int = 2) -> str:
    """A layer/param/shape table for the configured model (flax tabulate)."""
    model = build_model(config)
    size = config.model.image_size
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    return model.tabulate(
        jax.random.PRNGKey(0), x, train=False, depth=depth,
        console_kwargs={"width": 100, "force_terminal": False},
    )


def count_params(config: Config) -> int:
    """Total trainable parameter count (no FLOPs spent — eval_shape only)."""
    model = build_model(config)
    size = config.model.image_size
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    return sum(
        int(jnp.prod(jnp.asarray(leaf.shape)))
        for leaf in jax.tree_util.tree_leaves(shapes["params"]))
