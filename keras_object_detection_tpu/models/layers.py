"""Shared conv building blocks (parity target: ref yolo_v1/model.py:58-64
``cnn_block`` — ZeroPad -> Conv -> BatchNorm -> ReLU).

flax.linen modules with a ``dtype`` knob: activations/weights are cast to
bfloat16 on the forward path (MXU native) while parameters and batch stats
stay float32 (``param_dtype``) for stable training.
"""

from __future__ import annotations

from typing import Any, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBlock(nn.Module):
    """Explicitly-padded Conv + BatchNorm + ReLU.

    ``padding`` is a symmetric zero-pad applied before a VALID conv, the
    functional equivalent of the reference's ``ZeroPadding2D`` + ``Conv2D``
    pair (ref model.py:59-63). BN uses Keras-style hyperparameters
    (momentum 0.99, epsilon 1e-3) since the architecture is a Keras design.
    """

    filters: int
    kernel_size: int
    strides: int = 1
    padding: Union[int, str] = 0
    # "relu" = reference parity (ref model.py:63); "leaky_relu" = the original
    # YOLOv1 paper's LeakyReLU(0.1), present but commented in the reference
    # (ref model.py:62).
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if isinstance(self.padding, str):
            pad = self.padding  # 'SAME' for the head convs (ref model.py:247)
        else:
            pad = [(self.padding, self.padding)] * 2
        x = nn.Conv(
            self.filters,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=pad,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=0.1)
        return nn.relu(x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool (ref model.py:74)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
