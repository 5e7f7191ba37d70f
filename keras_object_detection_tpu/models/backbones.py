"""Transfer-learning backbone variants (parity targets:
ref yolo_v1/model.py:114-150 ``mobilenet_v2_yolo_v1`` and model.py:172-215
``vgg16_yolo_v1``, which wrap ``keras.applications`` VGG16 / MobileNetV2).

These are native flax re-implementations of the standard architectures (no
Keras, no weight porting — the reference itself mostly trains with
``weights=None`` or frozen features). Both produce a 14x14 feature map at
448x448 input, which the conv detection head strides down to 7x7, matching
the reference's shapes.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from keras_object_detection_tpu.models.darknet import (
    ARCHITECTURE_CONFIG,
    DARKNET19_CONFIG,
    DARKNET53_CONFIG,
    DARKNET_MICRO_CONFIG,
    DARKNET_TINY_CONFIG,
    DarknetBackbone,
)
from keras_object_detection_tpu.models.layers import make_batch_norm, max_pool_2x2


class VGG16Backbone(nn.Module):
    """VGG16 feature extractor (13 convs, 5 pools; Simonyan & Zisserman 2014).

    Output stride 32: 448x448 -> 14x14x512, the feature shape the reference's
    YOLOv1 head consumes (ref model.py:177-183).
    """

    dtype: Any = jnp.float32
    widths: Sequence[Tuple[int, int]] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # VGG16 has no batch norm
        for width, reps in self.widths:
            for _ in range(reps):
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32)(x)
                x = nn.relu(x)
            x = max_pool_2x2(x)
        return x


class _InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual block (Sandler et al. 2018)."""

    filters: int
    strides: int
    expand: int
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        residual = x
        hidden = inp * self.expand
        counter = iter(range(8))
        bn = lambda y: make_batch_norm(  # noqa: E731
            self.bn_mode, use_running_average=not train, momentum=0.999,
            epsilon=1e-3, dtype=self.dtype,
            name=f"BatchNorm_{next(counter)}")(y)
        if self.expand != 1:
            x = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
            x = nn.relu6(bn(x))
        x = nn.Conv(hidden, (3, 3), strides=(self.strides, self.strides),
                    padding="SAME", feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu6(bn(x))
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = bn(x)
        if self.strides == 1 and inp == self.filters:
            x = x + residual
        return x


class MobileNetV2Backbone(nn.Module):
    """MobileNetV2 feature extractor, output stride 32 (448 -> 14x14x1280).

    Standard (t, c, n, s) schedule from the paper, the same architecture the
    reference pulls from ``keras.applications.MobileNetV2`` (ref model.py:119).
    """

    dtype: Any = jnp.float32
    bn_mode: str = "flax"
    schedule: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 2),
        (6, 320, 1, 1),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        counter = iter(range(8))
        bn = lambda y: make_batch_norm(  # noqa: E731
            self.bn_mode, use_running_average=not train, momentum=0.999,
            epsilon=1e-3, dtype=self.dtype,
            name=f"BatchNorm_{next(counter)}")(y)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu6(bn(x))
        for t, c, n, s in self.schedule:
            for i in range(n):
                x = _InvertedResidual(c, s if i == 0 else 1, t, dtype=self.dtype,
                                      bn_mode=self.bn_mode)(x, train=train)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.relu6(bn(x))
        return x


def _darknet24(dtype, activation="relu", bn_mode="flax"):
    return DarknetBackbone(architecture=ARCHITECTURE_CONFIG,
                           activation=activation, dtype=dtype, bn_mode=bn_mode)


def _darknet_tiny(dtype, activation="relu", bn_mode="flax"):
    return DarknetBackbone(architecture=DARKNET_TINY_CONFIG,
                           activation=activation, dtype=dtype, bn_mode=bn_mode)


def _darknet_micro(dtype, activation="relu", bn_mode="flax"):
    return DarknetBackbone(architecture=DARKNET_MICRO_CONFIG,
                           activation=activation, dtype=dtype, bn_mode=bn_mode)


def _darknet19(dtype, activation="leaky_relu", bn_mode="flax"):
    # YOLOv2's backbone (arXiv:1612.08242 Table 6); the paper uses
    # LeakyReLU(0.1) throughout, so that is this variant's default.
    return DarknetBackbone(architecture=DARKNET19_CONFIG,
                           activation=activation, dtype=dtype, bn_mode=bn_mode)


def _darknet53(dtype, activation="leaky_relu", bn_mode="flax"):
    # YOLOv3's backbone (arXiv:1804.02767 Table 1, residual blocks);
    # LeakyReLU(0.1) per the paper. Pairs with head="fpn" (which constructs
    # it tap-enabled itself); registered here so generic consumers (backbone
    # geometry probes, standalone feature extraction) can build it too.
    return DarknetBackbone(architecture=DARKNET53_CONFIG,
                           activation=activation, dtype=dtype, bn_mode=bn_mode)


# activation applies to the darknet family (the reference's cnn_block knob,
# ref model.py:62-63); VGG16/MobileNetV2 keep their canonical activations.
BACKBONES = {
    "darknet24": _darknet24,
    "darknet19": _darknet19,
    "darknet53": _darknet53,
    "darknet_tiny": _darknet_tiny,
    "darknet_micro": _darknet_micro,
    "vgg16": lambda dtype, activation="relu", bn_mode="flax":
        VGG16Backbone(dtype=dtype),
    "mobilenetv2": lambda dtype, activation="relu", bn_mode="flax":
        MobileNetV2Backbone(dtype=dtype, bn_mode=bn_mode),
}
