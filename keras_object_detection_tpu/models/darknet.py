"""Darknet-style YOLOv1 backbones driven by a config table
(parity target: ref yolo_v1/model.py:36-85).

The table grammar is the reference's (a factual architecture spec from the
YOLOv1 paper): a tuple is ``(kernel_size, filters, stride, padding)``, ``"M"``
is a 2x2/2 max-pool, and a list is ``[conv_a, conv_b, num_repeats]``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from keras_object_detection_tpu.models.layers import ConvBlock, max_pool_2x2

# 24-conv YOLOv1 architecture (ref model.py:36-55; Redmon et al. 2016).
ARCHITECTURE_CONFIG: Sequence[Any] = (
    (7, 64, 2, 3),
    "M",
    (3, 192, 1, 1),
    "M",
    (1, 128, 1, 0),
    (3, 256, 1, 1),
    (1, 256, 1, 0),
    (3, 512, 1, 1),
    "M",
    [(1, 256, 1, 0), (3, 512, 1, 1), 4],
    (1, 512, 1, 0),
    (3, 1024, 1, 1),
    "M",
    [(1, 512, 1, 0), (3, 1024, 1, 1), 2],
    (3, 1024, 1, 1),
    (3, 1024, 2, 1),
    (3, 1024, 1, 1),
    (3, 1024, 1, 1),
)

# Net-new micro variant for fast tests (56x56 -> 7x7, 3 pools).
DARKNET_MICRO_CONFIG: Sequence[Any] = (
    (3, 16, 1, 1),
    "M",
    (3, 32, 1, 1),
    "M",
    (3, 64, 1, 1),
    "M",
    (3, 64, 1, 1),
)

# Net-new small variant for CPU tests / BASELINE config 1 (224x224 -> 7x7).
DARKNET_TINY_CONFIG: Sequence[Any] = (
    (3, 16, 1, 1),
    "M",
    (3, 32, 1, 1),
    "M",
    (3, 64, 1, 1),
    "M",
    (3, 128, 1, 1),
    "M",
    (3, 256, 1, 1),
    "M",
    (3, 256, 1, 1),
)


# name -> architecture table, for callers that need a tap-enabled backbone
# (the YOLOv2 passthrough head, models/yolo.py)
ARCHITECTURES = {
    "darknet24": ARCHITECTURE_CONFIG,
    "darknet_tiny": DARKNET_TINY_CONFIG,
    "darknet_micro": DARKNET_MICRO_CONFIG,
}


def _last_downsample_index(architecture: Sequence[Any]) -> int:
    """Index of the last spatially-downsampling entry (pool or stride-2 conv).

    Repeat blocks in the tables are always stride-1, so only scalar entries
    are considered. Used by the YOLOv2 passthrough tap (models/yolo.py)."""
    last = -1
    for i, entry in enumerate(architecture):
        if isinstance(entry, str):
            last = i
        elif len(entry) == 4 and all(isinstance(v, int) for v in entry):
            if entry[2] > 1:
                last = i
    return last


class DarknetBackbone(nn.Module):
    """Walks an architecture table (ref model.py:67-85 ``yolov1_backbone``).

    ``return_tap=True`` additionally returns the feature map captured just
    BEFORE the last spatial downsample — the 2x-resolution source for the
    YOLOv2 passthrough head (net-new; no reference counterpart). The tap adds
    no parameters, so checkpoints are interchangeable across the flag.
    """

    architecture: Sequence[Any] = ARCHITECTURE_CONFIG
    activation: str = "relu"
    dtype: Any = jnp.float32
    bn_mode: str = "flax"
    return_tap: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        tap_at = _last_downsample_index(self.architecture) \
            if self.return_tap else -1
        tap = None
        for i, entry in enumerate(self.architecture):
            if i == tap_at:
                tap = x
            # flax canonicalizes lists to tuples in module attributes, so
            # dispatch on content: 4 ints = conv, "M" = pool, else repeat block.
            if isinstance(entry, str):
                x = max_pool_2x2(x)
            elif len(entry) == 4 and all(isinstance(v, int) for v in entry):
                k, f, s, p = entry
                x = ConvBlock(f, k, s, p, activation=self.activation,
                              dtype=self.dtype, bn_mode=self.bn_mode)(
                                  x, train=train)
            else:  # (conv_a, conv_b, repeats)
                conv_a, conv_b, repeats = entry
                for _ in range(repeats):
                    x = ConvBlock(conv_a[1], conv_a[0], conv_a[2], conv_a[3],
                                  activation=self.activation,
                                  dtype=self.dtype, bn_mode=self.bn_mode)(
                                      x, train=train)
                    x = ConvBlock(conv_b[1], conv_b[0], conv_b[2], conv_b[3],
                                  activation=self.activation,
                                  dtype=self.dtype, bn_mode=self.bn_mode)(
                                      x, train=train)
        if self.return_tap:
            return x, tap
        return x
