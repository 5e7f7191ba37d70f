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

# Darknet-19 (YOLOv2's backbone, arXiv:1612.08242 Table 6; net-new — the
# reference repo is YOLOv1-only). 18 feature convs in the same table grammar;
# the paper's 19th conv is its 1000-way classifier head, dropped for
# detection. Alternating 3x3 / 1x1 bottlenecks, BN on every conv, stride 32.
# The feature before the last pool (the 512-ch 3x3 output) is exactly the
# YOLOv2 passthrough tap, which ``return_tap=True`` captures.
DARKNET19_CONFIG: Sequence[Any] = (
    (3, 32, 1, 1),
    "M",
    (3, 64, 1, 1),
    "M",
    (3, 128, 1, 1),
    (1, 64, 1, 0),
    (3, 128, 1, 1),
    "M",
    (3, 256, 1, 1),
    (1, 128, 1, 0),
    (3, 256, 1, 1),
    "M",
    (3, 512, 1, 1),
    (1, 256, 1, 0),
    (3, 512, 1, 1),
    (1, 256, 1, 0),
    (3, 512, 1, 1),
    "M",
    (3, 1024, 1, 1),
    (1, 512, 1, 0),
    (3, 1024, 1, 1),
    (1, 512, 1, 0),
    (3, 1024, 1, 1),
)

# Darknet-53 (YOLOv3's backbone, arXiv:1804.02767 Table 1; net-new — the
# reference repo is YOLOv1-only). Extends the table grammar with a residual
# entry ``("R", filters, repeats)``: each repeat is a 1x1(filters/2) ->
# 3x3(filters) bottleneck with an identity skip-add. Downsampling is by
# stride-2 convs (no pooling in v3); 52 feature convs (the paper's 53rd is
# its classifier), LeakyReLU(0.1), stride 32. The features after the
# stride-8 and stride-16 residual stages are the FPN pyramid taps
# (``return_taps=2`` captures them — models/yolo.py FPNHead).
DARKNET53_CONFIG: Sequence[Any] = (
    (3, 32, 1, 1),
    (3, 64, 2, 1),
    ("R", 64, 1),
    (3, 128, 2, 1),
    ("R", 128, 2),
    (3, 256, 2, 1),
    ("R", 256, 8),
    (3, 512, 2, 1),
    ("R", 512, 8),
    (3, 1024, 2, 1),
    ("R", 1024, 4),
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
    "darknet19": DARKNET19_CONFIG,
    "darknet53": DARKNET53_CONFIG,
    "darknet_tiny": DARKNET_TINY_CONFIG,
    "darknet_micro": DARKNET_MICRO_CONFIG,
}


def _downsample_indices(architecture: Sequence[Any]) -> list:
    """Indices of the spatially-downsampling entries (pools / stride-2
    convs), in table order. Repeat and residual blocks in the tables are
    always stride-1, so only scalar conv entries are considered. Drives the
    YOLOv2 passthrough tap and the FPN pyramid taps (models/yolo.py)."""
    out = []
    for i, entry in enumerate(architecture):
        if isinstance(entry, str):
            out.append(i)
        elif (len(entry) == 4 and all(isinstance(v, int) for v in entry)
              and entry[2] > 1):
            out.append(i)
    return out


def _last_downsample_index(architecture: Sequence[Any]) -> int:
    """Index of the last downsampling entry (-1 if none) — the YOLOv2
    passthrough tap point."""
    ds = _downsample_indices(architecture)
    return ds[-1] if ds else -1


class DarknetBackbone(nn.Module):
    """Walks an architecture table (ref model.py:67-85 ``yolov1_backbone``).

    ``return_tap=True`` additionally returns the feature map captured just
    BEFORE the last spatial downsample — the 2x-resolution source for the
    YOLOv2 passthrough head (net-new; no reference counterpart).
    ``return_taps=N`` instead returns ``(out, taps)`` with the features
    before each of the last N downsamples, ordered coarse -> fine
    ((2x, 4x, ...) resolution) — the FPN pyramid for the YOLOv3-style head.
    Taps add no parameters, so checkpoints are interchangeable across both
    flags.
    """

    architecture: Sequence[Any] = ARCHITECTURE_CONFIG
    activation: str = "relu"
    dtype: Any = jnp.float32
    bn_mode: str = "flax"
    return_tap: bool = False
    return_taps: int = 0  # pyramid taps (FPN); mutually exclusive w/ the bool

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        if self.return_tap and self.return_taps:
            raise ValueError("return_tap and return_taps are exclusive")
        n_taps = 1 if self.return_tap else self.return_taps
        tap_at = {}
        if n_taps:
            ds = _downsample_indices(self.architecture)
            if len(ds) < n_taps:
                raise ValueError(
                    f"{n_taps} taps need {n_taps} downsamples; the table "
                    f"has {len(ds)}")
            # taps coarse -> fine: before the LAST downsample first
            tap_at = {idx: n_taps - 1 - j
                      for j, idx in enumerate(ds[-n_taps:])}
        taps = [None] * n_taps
        for i, entry in enumerate(self.architecture):
            if i in tap_at:
                taps[tap_at[i]] = x
            # flax canonicalizes lists to tuples in module attributes, so
            # dispatch on content: 4 ints = conv, "M" = pool,
            # ("R", f, n) = residual stage, else repeat block.
            if isinstance(entry, str):
                x = max_pool_2x2(x)
            elif len(entry) == 4 and all(isinstance(v, int) for v in entry):
                k, f, s, p = entry
                x = ConvBlock(f, k, s, p, activation=self.activation,
                              dtype=self.dtype, bn_mode=self.bn_mode)(
                                  x, train=train)
            elif entry[0] == "R":  # residual stage (darknet53 grammar)
                _, f, repeats = entry
                for _ in range(repeats):
                    y = ConvBlock(f // 2, 1, 1, 0,
                                  activation=self.activation,
                                  dtype=self.dtype, bn_mode=self.bn_mode)(
                                      x, train=train)
                    y = ConvBlock(f, 3, 1, 1, activation=self.activation,
                                  dtype=self.dtype, bn_mode=self.bn_mode)(
                                      y, train=train)
                    x = x + y  # identity skip (arXiv:1804.02767 Table 1)
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
            return x, taps[0]
        if self.return_taps:
            return x, tuple(taps)
        return x
