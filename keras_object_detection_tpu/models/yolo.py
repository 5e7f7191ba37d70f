"""YOLOv1 detection heads and the assembled model
(parity targets: ref yolo_v1/model.py:88-111 ``yolov1`` dense-head variant,
model.py:218-274 ``YoloV1`` subclassed conv-head model — the "working model"
per SURVEY.md — and the multi-conv dense variants at model.py:114-150/172-215).

The framework standardizes on the grid-shaped ``(S, S, B*5 + C)`` output; the
flat head variants reshape internally and can optionally emit flat tensors for
strict surface parity with the reference's modular scripts (which reshape late
at ref train.py:208).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.models.backbones import BACKBONES
from keras_object_detection_tpu.models.darknet import DarknetBackbone
from keras_object_detection_tpu.models.layers import (ConvBlock,
                                                      make_batch_norm,
                                                      space_to_depth)


class ConvHead(nn.Module):
    """Conv detection head (ref model.py:247-271): Conv1024 3x3 s2 SAME ->
    BN -> ReLU -> Conv(B*5 + C) 1x1. Output is grid-shaped; the final conv is
    computed in float32 so detection logits keep full precision."""

    cell_depth: int
    grid: int = 7
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The reference pairs this head with 14x14 backbone features and
        # strides down to 7 (ref model.py:247); backbones that already emit
        # the grid resolution (darknet24) keep stride 1.
        stride = max(x.shape[1] // self.grid, 1)
        x = ConvBlock(1024, 3, strides=stride, padding="SAME", dtype=self.dtype,
                      bn_mode=self.bn_mode)(x, train=train)
        x = nn.Conv(self.cell_depth, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x


class PassthroughConvHead(nn.Module):
    """Conv head with the YOLOv2 passthrough connection (arXiv:1612.08242 §2;
    net-new — the reference repo has no YOLOv2 model).

    The 2x-resolution backbone tap is channel-reduced by a 1x1 conv, folded to
    grid resolution with ``space_to_depth`` (the 'reorg' layer — a pure layout
    transform XLA compiles to a copy), concatenated with the stride-matched
    deep features, and mixed by a 3x3 conv before the final float32 1x1
    projection. Fine-grained features reach the detector without any extra
    spatial compute at tap resolution beyond the cheap 1x1."""

    cell_depth: int
    grid: int = 7
    tap_filters: int = 64  # YOLOv2's 1x1 reduction before reorg
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, tap: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        stride = max(x.shape[1] // self.grid, 1)
        x = ConvBlock(1024, 3, strides=stride, padding="SAME", dtype=self.dtype,
                      bn_mode=self.bn_mode)(x, train=train)
        tap = ConvBlock(self.tap_filters, 1, strides=1, padding="SAME",
                        dtype=self.dtype, bn_mode=self.bn_mode)(tap, train=train)
        block = tap.shape[1] // x.shape[1]
        if block < 1 or tap.shape[1] != x.shape[1] * block:
            raise ValueError(
                f"passthrough tap {tap.shape} does not fold onto {x.shape}")
        if block > 1:
            tap = space_to_depth(tap, block)
        x = jnp.concatenate([x, tap.astype(x.dtype)], axis=-1)
        x = ConvBlock(1024, 3, strides=1, padding="SAME", dtype=self.dtype,
                      bn_mode=self.bn_mode)(x, train=train)
        x = nn.Conv(self.cell_depth, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x


class FPNHead(nn.Module):
    """YOLOv3-style multi-scale detection head (arXiv:1804.02767 §2.3
    "Predictions Across Scales"; net-new — the reference repo is
    YOLOv1-only). Pairs with ``DarknetBackbone(return_taps=num_scales-1)``.

    Per scale (coarse -> fine): a 5-conv 1x1/3x3 alternating trunk at ``f``
    channels, a 3x3(2f) + float32 1x1 prediction branch emitting the
    per-scale anchor layout ``B_s*(5+C)`` (core/fpn.py), then a 1x1(f/2)
    route + nearest 2x upsample concatenated with the next backbone tap —
    exactly the v3 topology. The upsample is ``jnp.repeat`` twice (a
    broadcast+reshape XLA lowers to a copy — no gather, MXU-friendly).
    Channel widths halve per scale from ``base_filters`` (512/256/128 for
    the paper's 3 scales).
    """

    cell_depth: int  # per-scale output depth B_s * (5 + C)
    num_scales: int = 3
    base_filters: int = 512
    activation: str = "leaky_relu"  # the v3 paper's LeakyReLU(0.1)
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, taps: Sequence[jnp.ndarray],
                 train: bool = False):
        if len(taps) != self.num_scales - 1:
            raise ValueError(
                f"FPNHead with {self.num_scales} scales needs "
                f"{self.num_scales - 1} backbone taps, got {len(taps)}")
        kw = dict(activation=self.activation, dtype=self.dtype,
                  bn_mode=self.bn_mode)
        outs = []
        f = self.base_filters
        for s in range(self.num_scales):
            for k in (1, 3, 1, 3, 1):  # the v3 5-conv trunk
                x = ConvBlock(f if k == 1 else 2 * f, k, strides=1,
                              padding="SAME", **kw)(x, train=train)
            y = ConvBlock(2 * f, 3, strides=1, padding="SAME", **kw)(
                x, train=train)
            y = nn.Conv(self.cell_depth, (1, 1), dtype=jnp.float32,
                        param_dtype=jnp.float32)(y.astype(jnp.float32))
            outs.append(y)
            if s + 1 < self.num_scales:
                f //= 2
                x = ConvBlock(f, 1, strides=1, padding="SAME", **kw)(
                    x, train=train)
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                tap = taps[s]
                if tap.shape[1] != x.shape[1]:
                    raise ValueError(
                        f"FPN tap {s} has spatial size {tap.shape[1]}, "
                        f"expected {x.shape[1]} (backbone taps must be "
                        "consecutive 2x-resolution steps)")
                x = jnp.concatenate([x, tap.astype(x.dtype)], axis=-1)
        return tuple(outs)


class GAPDenseHead(nn.Module):
    """GAP dense head (ref model.py:97-107): GlobalAvgPool -> Dense(4960) ->
    BN -> ReLU -> Dense(S*S*depth), reshaped to the grid.

    ``use_batchnorm=False`` gives the ``test_model`` variant's plain
    GAP -> Dense -> ReLU head (ref model.py:153-169)."""

    grid: int
    cell_depth: int
    units: int = 4960
    use_batchnorm: bool = True
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.mean(x, axis=(1, 2))  # GlobalAveragePooling2D
        x = nn.Dense(self.units, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.use_batchnorm:
            x = make_batch_norm(self.bn_mode, use_running_average=not train,
                                momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                                name="BatchNorm_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.grid * self.grid * self.cell_depth, dtype=jnp.float32,
                     param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x.reshape(x.shape[0], self.grid, self.grid, self.cell_depth)


class MultiConvDenseHead(nn.Module):
    """The VGG16/MobileNetV2 variant head (ref model.py:125-148, 183-213):
    4x Conv1024 (stride 2 on the second) -> Flatten -> Dense stack ->
    Dropout(0.5) -> Dense(S*S*depth)."""

    grid: int
    cell_depth: int
    dense_units: Sequence[int] = (512, 1024)  # vgg16 variant; mnv2 uses (4096,)
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, stride in enumerate((1, 2, 1, 1)):
            x = ConvBlock(1024, 3, strides=stride, padding="SAME",
                          dtype=self.dtype, bn_mode=self.bn_mode)(x, train=train)
        x = x.reshape(x.shape[0], -1)  # Flatten
        for units in self.dense_units:
            x = nn.Dense(units, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.grid * self.grid * self.cell_depth, dtype=jnp.float32,
                     param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x.reshape(x.shape[0], self.grid, self.grid, self.cell_depth)


HEADS = {"conv", "gap_dense", "flatten_dense", "anchor", "fpn"}


class YoloV1(nn.Module):
    """Backbone + head assembly (ref model.py:218-274 surface).

    ``flat_output=True`` reproduces the modular scripts' flat
    ``(batch, S*S*depth)`` emission (ref model.py:107); default is the
    grid-shaped working-model layout (ref yolo_v1.py:605).
    """

    backbone: str = "darknet24"
    head: str = "conv"
    grid: int = 7
    num_classes: int = 20
    num_boxes: int = 2
    # anchor priors for head="anchor" (the YOLOv2 family, core/anchors.py);
    # only the COUNT matters here (output depth B*(5+C))
    anchors: tuple = ()
    compute_dtype: Any = jnp.float32
    head_dense_units: int = 4960
    head_batchnorm: bool = True
    activation: str = "relu"  # darknet conv activation; "leaky_relu" = paper
    flat_output: bool = False
    remat: bool = False
    bn_mode: str = "flax"  # "fused" = Pallas BN-stats kernels | "flax"
    # Keras trainable=False semantics (ref yolo_v1.py:819-820): a frozen
    # backbone runs in INFERENCE mode — BatchNorm normalizes with its moving
    # statistics and never updates them (matching Keras BN's trainable=False
    # behavior since TF 2.0); gradients are stopped in the train step.
    freeze_backbone: bool = False
    # YOLOv2 passthrough/reorg skip connection (anchor head + darknet
    # backbones only): feeds the 2x-resolution backbone tap into the head
    # via space_to_depth. Changes the head architecture, so checkpoints are
    # NOT interchangeable with passthrough off.
    passthrough: bool = False
    # FPN (YOLOv3-style) scale count for head="fpn"; anchors are split by
    # area across the scales (core/fpn.py partition_anchors).
    fpn_scales: int = 3

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        depth = self.num_classes + 5 * self.num_boxes
        if self.head == "anchor":
            depth = len(self.anchors) * (5 + self.num_classes)
        elif self.head == "fpn":
            from keras_object_detection_tpu.core.fpn import partition_anchors
            per = partition_anchors(self.anchors, self.fpn_scales)
            depth = len(per[0]) * (5 + self.num_classes)  # per-scale depth
        x = images.astype(self.compute_dtype)
        # NOTE: rematerialization is applied at the train-step level
        # (train/loop.py) via jax.checkpoint around the whole forward —
        # flax-module-level nn.remat would rename parameter scopes and break
        # checkpoint compatibility between remat on/off.
        tap = None
        if self.head == "fpn":
            if self.passthrough:
                raise ValueError("passthrough is a YOLOv2 anchor-head knob; "
                                 "the fpn head has its own lateral taps")
            if not self.backbone.startswith("darknet"):
                raise ValueError(
                    f"head='fpn' supports darknet backbones only (pyramid "
                    f"taps), got {self.backbone!r}")
            from keras_object_detection_tpu.models.darknet import (
                ARCHITECTURES)
            x, taps = DarknetBackbone(
                architecture=ARCHITECTURES[self.backbone],
                activation=self.activation, dtype=self.compute_dtype,
                bn_mode=self.bn_mode, return_taps=self.fpn_scales - 1)(
                    x, train=train and not self.freeze_backbone)
            return FPNHead(depth, num_scales=self.fpn_scales,
                           activation=self.activation,
                           dtype=self.compute_dtype,
                           bn_mode=self.bn_mode)(x, taps, train=train)
        if self.passthrough:
            if self.head != "anchor":
                raise ValueError("passthrough requires head='anchor'")
            if not self.backbone.startswith("darknet"):
                raise ValueError(
                    f"passthrough supports darknet backbones only, "
                    f"got {self.backbone!r}")
            # the tap is a module attribute (affects the return signature),
            # so the backbone is constructed with it enabled; same class and
            # position as the plain path -> same parameter scope
            from keras_object_detection_tpu.models.darknet import (
                ARCHITECTURES)
            x, tap = DarknetBackbone(
                architecture=ARCHITECTURES[self.backbone],
                activation=self.activation, dtype=self.compute_dtype,
                bn_mode=self.bn_mode, return_tap=True)(
                    x, train=train and not self.freeze_backbone)
        else:
            x = BACKBONES[self.backbone](self.compute_dtype, self.activation,
                                         bn_mode=self.bn_mode)(
                x, train=train and not self.freeze_backbone)
        if self.head == "anchor" and self.passthrough:
            out = PassthroughConvHead(depth, grid=self.grid,
                                      dtype=self.compute_dtype,
                                      bn_mode=self.bn_mode)(x, tap, train=train)
        elif self.head in ("conv", "anchor"):
            # the anchor family reuses the conv head structure with the
            # B*(5+C) per-anchor layout (core/anchors.py)
            out = ConvHead(depth, grid=self.grid, dtype=self.compute_dtype,
                           bn_mode=self.bn_mode)(x, train=train)
        elif self.head == "gap_dense":
            out = GAPDenseHead(self.grid, depth, units=self.head_dense_units,
                               use_batchnorm=self.head_batchnorm,
                               dtype=self.compute_dtype,
                               bn_mode=self.bn_mode)(x, train=train)
            if self.flat_output:
                return out.reshape(out.shape[0], -1)
        elif self.head == "flatten_dense":
            units = (4096,) if self.backbone == "mobilenetv2" else (512, 1024)
            out = MultiConvDenseHead(self.grid, depth, dense_units=units,
                                     dtype=self.compute_dtype,
                                     bn_mode=self.bn_mode)(x, train=train)
            if self.flat_output:
                return out.reshape(out.shape[0], -1)
        else:
            raise ValueError(f"unknown head {self.head!r}; options: {sorted(HEADS)}")
        if self.flat_output:
            return out.reshape(out.shape[0], -1)
        return out


def build_model(config: Config) -> YoloV1:
    """Build the flagship model from a ``Config`` (the registry entry point)."""
    m: ModelConfig = config.model
    g: GridConfig = config.grid
    if m.head == "anchor":
        g.head_depth("anchor")  # raises "requires GridConfig.anchors" early
    elif m.head == "fpn":
        from keras_object_detection_tpu.core.fpn import partition_anchors
        if not g.anchors:
            raise ValueError("head='fpn' requires GridConfig.anchors (fit "
                             "3*num_scales with tools/kmeans_anchors.py)")
        partition_anchors(g.anchors, m.fpn_scales)  # raises on bad count
    return YoloV1(
        backbone=m.backbone,
        head=m.head,
        grid=g.grid,
        num_classes=g.num_classes,
        num_boxes=g.num_boxes,
        anchors=tuple(tuple(a) for a in getattr(g, "anchors", ()) or ()),
        compute_dtype=jnp.dtype(m.compute_dtype),
        head_dense_units=m.head_dense_units,
        head_batchnorm=getattr(m, "head_batchnorm", True),
        activation=getattr(m, "activation", "relu"),
        remat=getattr(m, "remat", False),
        bn_mode=getattr(m, "bn_mode", "flax"),
        freeze_backbone=getattr(m, "freeze_backbone", False),
        passthrough=getattr(m, "passthrough", False),
        fpn_scales=getattr(m, "fpn_scales", 3),
    )
