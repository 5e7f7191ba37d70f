"""True int8 TPU serving: BatchNorm folding + s8 x s8 -> s32 convolutions.

The round-2 ``QuantizedInferenceModel`` (export/quantize.py) stores int8
weights but dequantizes them to f32 INSIDE the forward; XLA cannot fuse an
elementwise producer into a convolution operand, so the f32 weights
materialize and batch-1 latency LOSES to float (measured 139 vs 30 ms p50).
This module removes the materialization the TPU-native way:

- BatchNorm (inference mode) is folded into each conv's kernel/bias, so a
  ConvBlock (ref model.py:58-64 ZeroPad -> Conv -> BN -> ReLU) becomes a
  plain conv + bias + activation;
- folded kernels are quantized per-output-channel symmetric int8 and the
  convolution runs natively as ``lax.conv_general_dilated(int8, int8,
  preferred_element_type=int32)`` — the MXU's s8 x s8 -> s32 mode. Weight
  HBM traffic drops 4x vs f32 (45 vs 180 MB for the flagship) with NO
  dequantized copy, and int8 doubles MXU throughput over bf16;
- activations are quantized dynamically per tensor (absmax / 127); the
  int32 accumulator is exact, rescaled once by ``act_scale *
  per_channel_weight_scale`` and biased in f32. Symmetric quantization means
  the explicit ZeroPadding stays exact (zero-point is 0). The final 1 x 1
  detection conv (ref model.py:269) stays f32 for full logit precision.

Scope: the table-driven Darknet backbones + the conv-head families — the
reference's only working pipeline (ref yolo_v1.py:605, model.py:218-274)
and the YOLOv2 anchor head, which reuses the identical ConvHead structure
(models/yolo.py:309-313; only the grid decode differs). Other
backbones/heads (gap_dense, flatten_dense, passthrough, fpn) raise; use the
float ``InferenceModel`` or the weight-only ``QuantizedInferenceModel``
there.

The reference left its int8 recipe commented out and unvalidated
(ref convert_to_tflite.py:17-30); here it is a first-class measured path —
``tools/ptq_delta.py --int8-serving`` reports the mAP delta and
``benchmark_latency`` the latency against float.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.core.grid import decode_grid
from keras_object_detection_tpu.models.darknet import ARCHITECTURES
from keras_object_detection_tpu.ops.pallas_nms import (
    auto_batched_non_max_suppression,
)

# every table-driven darknet backbone (incl. darknet19) folds the same way
_TABLES = ARCHITECTURES

_BN_EPS = 1e-3  # ConvBlock's Keras-style epsilon (models/layers.py)


def conv_plan(backbone: str) -> List[Tuple]:
    """Flatten an architecture table (models/darknet.py grammar, ref
    model.py:36-55) into execution-ordered steps:
    ``("conv", kernel, stride, pad)`` / ``("pool",)``. Conv index order
    matches flax's ``ConvBlock_i`` auto-numbering (models/darknet.py walks
    the table in order)."""
    if backbone not in _TABLES:
        raise ValueError(
            f"int8 serving supports table-driven darknet backbones "
            f"{sorted(_TABLES)}, not {backbone!r}")
    steps: List[Tuple] = []
    for entry in _TABLES[backbone]:
        if isinstance(entry, str):
            steps.append(("pool",))
        elif len(entry) == 4 and all(isinstance(v, int) for v in entry):
            k, _, s, p = entry
            steps.append(("conv", k, s, p))
        else:
            conv_a, conv_b, repeats = entry
            for _ in range(repeats):
                steps.append(("conv", conv_a[0], conv_a[2], conv_a[3]))
                steps.append(("conv", conv_b[0], conv_b[2], conv_b[3]))
    return steps


def fold_conv_bn(kernel, bias, bn_scale, bn_bias, bn_mean, bn_var,
                 eps: float = _BN_EPS):
    """Fold inference-mode BatchNorm into the preceding conv:
    ``BN(conv(x, W) + b) == conv(x, W * m) + (beta + (b - mean) * m)`` with
    ``m = gamma / sqrt(var + eps)`` — exact in f64, evaluated in f32 like the
    float path's own normalize (models/layers.py:80-84)."""
    m = np.asarray(bn_scale, np.float64) / np.sqrt(
        np.asarray(bn_var, np.float64) + eps)
    w = np.asarray(kernel, np.float64) * m  # broadcast over out-channel axis
    b = (np.asarray(bn_bias, np.float64)
         + (np.asarray(bias, np.float64) - np.asarray(bn_mean, np.float64))
         * m)
    return w.astype(np.float32), b.astype(np.float32)


def _quantize_kernel(w: np.ndarray):
    """Per-output-channel symmetric int8: (k, k, cin, cout) -> int8 kernel +
    (cout,) f32 scale."""
    absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    scale = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def build_int8_layers(config: Config, params: Any, batch_stats: Any,
                      float_tail: int = 0):
    """(static_plan, layer_param_list) for ``int8_forward``.

    ``static_plan`` drives tracing (tuple of step kinds); the layer params —
    int8 kernels, per-channel scales, folded f32 biases, and the f32 head
    conv — are a pytree passed as jit ARGUMENTS (never closure captures; see
    eval/evaluator.py:46-48).

    ``float_tail``: keep the LAST N folded convs (counting the 3x3 head
    conv) in f32 — a mixed-precision knob for accuracy-sensitive tails.
    Measured on the flagship 0.783-mAP checkpoint: full-int8 costs
    -0.018 mAP; the tail layers feed the logits most directly, so they are
    the first to exempt. The final 1x1 detection conv is ALWAYS f32.
    """
    if config.model.head not in ("conv", "anchor"):
        raise ValueError("int8 serving supports head='conv' and the "
                         "anchor head (same ConvHead structure, "
                         "models/yolo.py:309-313); "
                         f"got {config.model.head!r}")
    if getattr(config.model, "passthrough", False):
        raise ValueError("int8 serving does not fold the passthrough reorg "
                         "head (PassthroughConvHead); serve it float "
                         "(eval/evaluator.py InferenceModel)")
    plan = conv_plan(config.model.backbone)
    bb_p = params["DarknetBackbone_0"]
    bb_s = batch_stats["DarknetBackbone_0"]
    head_p = params["ConvHead_0"]
    head_s = batch_stats["ConvHead_0"]

    folded: List[Tuple[np.ndarray, np.ndarray]] = []
    ci = 0
    for step in plan:
        if step[0] != "conv":
            continue
        blk = f"ConvBlock_{ci}"
        folded.append(fold_conv_bn(
            bb_p[blk]["Conv_0"]["kernel"], bb_p[blk]["Conv_0"]["bias"],
            bb_p[blk]["BatchNorm_0"]["scale"], bb_p[blk]["BatchNorm_0"]["bias"],
            bb_s[blk]["BatchNorm_0"]["mean"], bb_s[blk]["BatchNorm_0"]["var"]))
        ci += 1

    # head ConvBlock (Conv1024 3x3 SAME, ref model.py:247)
    folded.append(fold_conv_bn(
        head_p["ConvBlock_0"]["Conv_0"]["kernel"],
        head_p["ConvBlock_0"]["Conv_0"]["bias"],
        head_p["ConvBlock_0"]["BatchNorm_0"]["scale"],
        head_p["ConvBlock_0"]["BatchNorm_0"]["bias"],
        head_s["ConvBlock_0"]["BatchNorm_0"]["mean"],
        head_s["ConvBlock_0"]["BatchNorm_0"]["var"]))

    n_conv = len(folded)
    float_tail = max(0, min(int(float_tail), n_conv))
    layers: List[Dict[str, Any]] = []
    for i, (w, b) in enumerate(folded):
        if i >= n_conv - float_tail:
            layers.append({
                "w": jnp.asarray(np.asarray(w, np.float32)),
                "bias": jnp.asarray(np.asarray(b, np.float32))})
        else:
            q, ws = _quantize_kernel(w)
            layers.append({"w_q": jnp.asarray(q), "w_scale": jnp.asarray(ws),
                           "bias": jnp.asarray(b)})
    # final 1x1 detection conv stays f32 (full logit precision)
    layers.append({
        "w": jnp.asarray(np.asarray(head_p["Conv_0"]["kernel"], np.float32)),
        "b": jnp.asarray(np.asarray(head_p["Conv_0"]["bias"], np.float32)),
    })
    return tuple(plan), layers


_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_act(x: jnp.ndarray):
    """Dynamic PER-IMAGE symmetric activation quantization (f32 -> int8).

    Scales have shape (batch, 1, 1, 1): one image's activation outliers must
    not coarsen every other image in the batch (a shared per-tensor scale
    measured -0.022 mAP on the flagship 0.783 checkpoint at eval batch 32;
    per-image scales also make batched eval equivalent to batch-1 serving).
    """
    absmax = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_conv(xq, x_scale, layer, stride: int, pad):
    """s8 x s8 -> s32 conv on the MXU, rescaled to f32 + folded bias."""
    if isinstance(pad, int):
        if pad:
            xq = jnp.pad(xq, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        padding = "VALID"  # zero-point 0 => explicit zero-pad is exact
    else:
        padding = pad  # "SAME" (head conv)
    acc = lax.conv_general_dilated(
        xq, layer["w_q"], (stride, stride), padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (x_scale * layer["w_scale"])
            + layer["bias"])


def _f32_conv(x, layer, stride: int, pad):
    """f32 conv for float_tail-kept layers (same padding semantics)."""
    if isinstance(pad, int):
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        padding = "VALID"
    else:
        padding = pad
    return lax.conv_general_dilated(
        x, layer["w"], (stride, stride), padding,
        dimension_numbers=_DN) + layer["bias"]


def int8_forward(plan: Sequence[Tuple], layers, images_u8: jnp.ndarray,
                 grid: int, activation: str = "relu") -> jnp.ndarray:
    """Quantized serving forward: u8 images -> (batch, S, S, depth) grid.

    Layer chain per conv: dynamic act quant -> int8 conv -> f32 rescale +
    bias -> ReLU/LeakyReLU; 2x2/2 max-pools run on the int8 tensor of the
    NEXT layer's quantization (max commutes with a positive per-image
    scale), saving 4x pool traffic. float_tail-kept layers (``w`` instead of
    ``w_q``) run in f32 on the unquantized activation — the quant boundary
    simply never materializes for them."""
    act = ((lambda v: jax.nn.leaky_relu(v, 0.1))
           if activation == "leaky_relu" else jax.nn.relu)
    # first layer input is u8/255 in [0, 1]: scale is STATIC (1/127), so the
    # quantization is a pure integer rescale of the uint8 pixels
    xq = jnp.round(images_u8.astype(jnp.float32) * (127.0 / 255.0)
                   ).astype(jnp.int8)
    x_scale = jnp.float32(1.0 / 127.0)
    x = (images_u8.astype(jnp.float32) / 255.0
         if "w_q" not in layers[0] else None)
    li = 0

    def conv_step(layer, stride, pad):
        nonlocal x, xq, x_scale
        if "w_q" in layer:
            if xq is None:
                xq, x_scale = _quantize_act(x)
            x = act(_int8_conv(xq, x_scale, layer, stride, pad))
        else:
            if x is None:
                x = xq.astype(jnp.float32) * x_scale  # exact dequant
            x = act(_f32_conv(x, layer, stride, pad))
        xq = None  # stale after any conv; requantized lazily when consumed

    for step in plan:
        if step[0] == "pool":
            if xq is None and "w_q" in layers[li]:
                # entering (or inside) the int8 regime: pool in int8
                xq, x_scale = _quantize_act(x)
            if xq is not None:
                xq = lax.reduce_window(
                    xq, jnp.int8(-128), lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
                x = None
            else:
                # f32 regime (float_tail): pool the f32 activation
                x = lax.reduce_window(
                    x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            continue
        _, k, stride, pad = step
        conv_step(layers[li], stride, pad)
        li += 1
    # head: Conv1024 3x3 SAME (stride adapts to the grid, models/yolo.py:39)
    spatial = x.shape[1] if x is not None else xq.shape[1]
    head_stride = max(spatial // grid, 1)
    conv_step(layers[li], head_stride, "SAME")
    li += 1
    final = layers[li]
    return lax.conv_general_dilated(
        x, final["w"], (1, 1), "VALID", dimension_numbers=_DN) + final["b"]


class Int8InferenceModel:
    """Drop-in ``InferenceModel`` twin serving from folded int8 weights.

    Same fused forward+decode+NMS single-program surface; weights stream
    from HBM as int8 with no dequantized copy. ``memory_footprint`` reports
    the resident weight bytes vs the float equivalent."""

    def __init__(self, config: Config, params: Any, batch_stats: Any,
                 float_tail: int = 0):
        self.config = config
        g = config.grid
        e = config.eval
        # head-aware decode, mirroring eval.evaluator.InferenceModel: the
        # folded int8 conv stack is identical for the v1 conv head and the
        # YOLOv2 anchor head (same ConvHead, models/yolo.py:309-313) — only
        # the grid decode differs
        if config.model.head == "anchor":
            from keras_object_detection_tpu.core.anchors import (
                decode_anchor_grid)
            anchors = tuple(tuple(a) for a in g.anchors)
            decode = lambda y: decode_anchor_grid(  # noqa: E731
                y, g.num_classes, anchors, g.grid)
        else:
            decode = lambda y: decode_grid(  # noqa: E731
                y, g.num_classes, g.num_boxes, g.grid)
        plan, layers = build_int8_layers(config, params, batch_stats,
                                         float_tail=float_tail)
        self._layers = jax.device_put(layers)
        activation = getattr(config.model, "activation", "relu")

        def forward(layers, images_u8):
            return int8_forward(plan, layers, images_u8, g.grid, activation)

        def forward_decode(layers, images_u8):
            boxes = decode(forward(layers, images_u8))
            if e.tta == "hflip":
                # same TTA semantics as the float InferenceModel
                # (eval/evaluator.py): mirror forward in the same program,
                # un-flip detections, NMS merges the union
                fb = decode(forward(layers, images_u8[:, :, ::-1, :]))
                fb = fb.at[..., 2].set(1.0 - fb[..., 2])
                boxes = jnp.concatenate([boxes, fb], axis=1)
            elif e.tta != "none":
                raise ValueError(f"unknown EvalConfig.tta {e.tta!r} "
                                 "(expected 'none' or 'hflip')")
            return boxes

        def forward_decode_nms(layers, images_u8):
            boxes = forward_decode(layers, images_u8)
            return auto_batched_non_max_suppression(
                boxes, e.iou_threshold, e.conf_threshold)

        self._forward = jax.jit(forward)
        self._forward_decode = jax.jit(forward_decode)
        self._forward_decode_nms = jax.jit(forward_decode_nms)
        # InferenceModel.benchmark_latency (borrowed below) passes
        # ``self._variables`` as the first jit argument; here that role is
        # played by the folded int8 layer list.
        self._variables = self._layers

    def predict_raw(self, images_u8) -> jnp.ndarray:
        return self._forward(self._layers, jnp.asarray(images_u8))

    def predict_decoded(self, images_u8) -> jnp.ndarray:
        return self._forward_decode(self._layers, jnp.asarray(images_u8))

    def predict(self, images_u8) -> Tuple[np.ndarray, np.ndarray]:
        boxes, valid = self._forward_decode_nms(
            self._layers, jnp.asarray(images_u8))
        return np.asarray(boxes), np.asarray(valid)

    def predict_single(self, image_u8) -> np.ndarray:
        boxes, valid = self.predict(np.asarray(image_u8)[None])
        return boxes[0][valid[0]]

    def memory_footprint(self) -> Dict[str, int]:
        qbytes = sum(int(v.size) * v.dtype.itemsize
                     for l in self._layers for v in l.values())
        fbytes = sum(
            (int(l["w_q"].size) if "w_q" in l else int(l["w"].size)) * 4
            + int(l["bias"].size if "bias" in l else l["b"].size) * 4
            for l in self._layers)
        return {"quantized_bytes": qbytes, "float_bytes": fbytes}

    def benchmark_latency(self, images_u8, runs: int = 5,
                          staged: bool = False) -> Dict[str, float]:
        """Shared timing harness (value-readback sync; see InferenceModel)."""
        from keras_object_detection_tpu.eval.evaluator import InferenceModel

        return InferenceModel.benchmark_latency(self, images_u8, runs=runs,
                                                staged=staged)


def select_serving_model(config: Config, params: Any, batch_stats: Any,
                         mode: str = "auto", probe_batch: int = 1,
                         probe_runs: int = 5):
    """Pick the serving path by MEASUREMENT, not hope.

    Int8 must win or step aside: on the relay-attached bench chip the int8
    path's batch-1 p50 measures 30.5 ms vs 25.1 ms float (both near the
    ~25 ms per-dispatch RTT floor; ``KOT_BENCH_INT8=1 python bench.py``), so
    defaulting to int8 would cost latency to save memory the serving host
    may not need. ``mode="auto"`` builds BOTH fused models, times each at
    ``probe_batch`` with the value-readback harness, and serves the faster;
    ``"float"``/``"int8"`` force a path (int8 still wins 4x on weight HBM
    residency — ``Int8InferenceModel.memory_footprint``).

    Returns ``(model, info)`` where ``info`` records the decision and, for
    auto, both measured p50s.
    """
    from keras_object_detection_tpu.eval.evaluator import InferenceModel

    if mode == "float":
        return InferenceModel(config, params, batch_stats), {"mode": "float"}
    if mode == "int8":
        return (Int8InferenceModel(config, params, batch_stats),
                {"mode": "int8"})
    if mode != "auto":
        raise ValueError(f"serving mode {mode!r} not in float|int8|auto")

    fmodel = InferenceModel(config, params, batch_stats)
    qmodel = Int8InferenceModel(config, params, batch_stats)
    size = config.model.image_size
    probe = np.zeros((probe_batch, size, size, 3), np.uint8)
    f_p50 = fmodel.benchmark_latency(probe, runs=probe_runs)["p50_ms"]
    q_p50 = qmodel.benchmark_latency(probe, runs=probe_runs)["p50_ms"]
    info = {"mode": "auto", "probe_batch": probe_batch,
            "float_p50_ms": round(f_p50, 3), "int8_p50_ms": round(q_p50, 3),
            "chosen": "int8" if q_p50 <= f_p50 else "float"}
    return (qmodel if info["chosen"] == "int8" else fmodel), info
