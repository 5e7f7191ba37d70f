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
- activations are quantized dynamically per image (absmax / 127) by
  default, or with STATIC calibrated scales (``calibrate_activation_scales``
  — the working analogue of the reference's commented-out
  ``representative_dataset`` recipe, ref convert_to_tflite.py:9-13) that
  clip outliers at the quantization-MSE-optimal point; the int32 accumulator
  is exact, rescaled once by ``act_scale * per_channel_weight_scale`` and
  biased in f32. Symmetric quantization means the explicit ZeroPadding stays
  exact (zero-point is 0). Final detection 1x1 convs stay f32 for full
  logit precision.

Scope: every table-driven Darknet backbone — including Darknet-53's
residual stages (``("R", f, n)`` grammar, models/darknet.py:80-92) — under
the conv head (ref yolo_v1.py:605, model.py:218-274), the YOLOv2 anchor
head (same ConvHead structure, models/yolo.py:299-303), the YOLOv2
passthrough head (1x1 tap reduce + space_to_depth reorg — a pure layout
transform, quantization-transparent — models/yolo.py:50-86), and the
YOLOv3-style FPN head (per-scale trunks, routes, nearest-2x laterals,
models/yolo.py:89-143). The dense-head variants (gap_dense, flatten_dense)
raise; use the float ``InferenceModel`` or the weight-only
``QuantizedInferenceModel`` there.

The reference left its int8 recipe commented out and unvalidated
(ref convert_to_tflite.py:17-30); here it is a first-class measured path —
``tools/ptq_delta.py --int8-serving`` reports the mAP delta and
``benchmark_latency`` the latency against float.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.core.grid import decode_grid
from keras_object_detection_tpu.models.darknet import (
    ARCHITECTURES,
    _downsample_indices,
)
from keras_object_detection_tpu.ops.pallas_nms import (
    auto_batched_non_max_suppression,
)

# every table-driven darknet backbone (incl. darknet19/53) folds the same way
_TABLES = ARCHITECTURES

_BN_EPS = 1e-3  # ConvBlock's Keras-style epsilon (models/layers.py)


def conv_plan(backbone: str, n_taps: int = 0) -> List[Tuple]:
    """Flatten an architecture table (models/darknet.py grammar, ref
    model.py:36-55) into execution-ordered steps:

    - ``("conv", kernel, stride, pad)`` — a ConvBlock (conv indices in walk
      order match flax's ``ConvBlock_i`` auto-numbering),
    - ``("pool",)`` — 2x2/2 max-pool,
    - ``("res_begin",)`` / ``("res_add",)`` — identity-skip boundaries of one
      darknet53 residual repeat (models/darknet.py:203-213),
    - ``("tap", j)`` — capture the running feature as pyramid tap ``j``
      (coarse -> fine), emitted before each of the last ``n_taps``
      downsampling entries exactly like ``DarknetBackbone.return_taps``
      (models/darknet.py:179-192)."""
    if backbone not in _TABLES:
        raise ValueError(
            f"int8 serving supports table-driven darknet backbones "
            f"{sorted(_TABLES)}, not {backbone!r}")
    table = _TABLES[backbone]
    tap_at = {}
    if n_taps:
        ds = _downsample_indices(table)
        if len(ds) < n_taps:
            raise ValueError(f"{n_taps} taps need {n_taps} downsamples; "
                             f"the {backbone} table has {len(ds)}")
        tap_at = {idx: n_taps - 1 - j for j, idx in enumerate(ds[-n_taps:])}
    steps: List[Tuple] = []
    for i, entry in enumerate(table):
        if i in tap_at:
            steps.append(("tap", tap_at[i]))
        if isinstance(entry, str):
            steps.append(("pool",))
        elif len(entry) == 4 and all(isinstance(v, int) for v in entry):
            k, _, s, p = entry
            steps.append(("conv", k, s, p))
        elif entry[0] == "R":  # residual stage (darknet53 grammar)
            _, f, repeats = entry
            for _ in range(repeats):
                steps.append(("res_begin",))
                steps.append(("conv", 1, 1, 0))
                steps.append(("conv", 3, 1, 1))
                steps.append(("res_add",))
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


def _fold_convblock(block_p, block_s):
    """Fold one ConvBlock's Conv_0 + BatchNorm_0 pair."""
    return fold_conv_bn(
        block_p["Conv_0"]["kernel"], block_p["Conv_0"]["bias"],
        block_p["BatchNorm_0"]["scale"], block_p["BatchNorm_0"]["bias"],
        block_s["BatchNorm_0"]["mean"], block_s["BatchNorm_0"]["var"])


def _head_plan(config: Config) -> Tuple[Tuple, int, int]:
    """(head_steps, n_head_convblocks, n_final_convs) for the head family.

    Head step kinds (executed after the backbone steps by
    ``int8_forward``):
    - ``("head_conv",)``: ConvBlock 3x3 SAME whose stride adapts to the grid
      (models/yolo.py:42),
    - ``("conv_same", kernel)``: stride-1 SAME ConvBlock,
    - ``("reorg_concat",)``: passthrough tap branch — 1x1 tap reduce was
      already consumed; space_to_depth the tap and concat (models/yolo.py:75-81),
    - ``("tap_conv",)``: run the NEXT ConvBlock on the saved tap instead of
      the main feature,
    - ``("emit",)``: f32 1x1 final conv -> append to outputs,
    - ``("pred_emit",)``: FPN prediction BRANCH — the 3x3(2f) ConvBlock plus
      the f32 1x1 final conv run on a copy of the trunk feature; the trunk
      itself continues unchanged into the route (models/yolo.py:126-130),
    - ``("route_up_concat", j)``: FPN 1x1 route + nearest-2x upsample +
      concat backbone tap ``j`` (models/yolo.py:131-142). The route conv is
      the next ConvBlock in the layer list."""
    head = config.model.head
    passthrough = getattr(config.model, "passthrough", False)
    if head == "conv" or (head == "anchor" and not passthrough):
        return (("head_conv",), ("emit",)), 1, 1
    if head == "anchor" and passthrough:
        # PassthroughConvHead (models/yolo.py:50-86): ConvBlock_0 on x,
        # ConvBlock_1 on the tap, reorg+concat, ConvBlock_2 mix, Conv_0.
        return (("head_conv",), ("tap_conv",), ("reorg_concat",),
                ("conv_same", 3), ("emit",)), 3, 1
    if head == "fpn":
        scales = config.model.fpn_scales
        steps: List[Tuple] = []
        n_blocks = 0
        for s in range(scales):
            for k in (1, 3, 1, 3, 1):  # the v3 5-conv trunk
                steps.append(("conv_same", k))
            steps.append(("pred_emit",))  # 2f ConvBlock + f32 1x1, branched
            n_blocks += 6
            if s + 1 < scales:
                steps.append(("route_up_concat", s))  # 1x1 route inside
                n_blocks += 1
        return tuple(steps), n_blocks, scales
    raise ValueError(
        "int8 serving supports head='conv', the anchor head (incl. "
        "passthrough), and the fpn head; the dense heads (gap_dense, "
        f"flatten_dense) serve float — got {head!r}")


def _head_scope(config: Config) -> str:
    head = config.model.head
    if head == "fpn":
        return "FPNHead_0"
    if head == "anchor" and getattr(config.model, "passthrough", False):
        return "PassthroughConvHead_0"
    return "ConvHead_0"


def build_int8_layers(config: Config, params: Any, batch_stats: Any,
                      float_tail: int = 0):
    """(static_plan, layer_param_list) for ``int8_forward``.

    ``static_plan`` drives tracing (tuple of step kinds: backbone steps from
    ``conv_plan`` followed by head steps from ``_head_plan``); the layer
    params — int8 kernels, per-channel scales, folded f32 biases, and the
    f32 final conv(s) — are a pytree passed as jit ARGUMENTS (never closure
    captures; see eval/evaluator.py:46-48).

    The layer list holds every folded ConvBlock in execution order (backbone
    walk order, then head call order — both match flax's auto-numbering),
    then the f32 final 1x1 detection conv(s) (one for conv/anchor/
    passthrough, one per scale for fpn) as ``{"w", "b"}`` entries.

    ``float_tail``: keep the LAST N folded convs in f32 — a mixed-precision
    knob for accuracy-sensitive tails. Measured on the flagship 0.783-mAP
    checkpoint: full-int8 costs -0.018 mAP with dynamic per-image scales;
    the tail layers feed the logits most directly, so they are the first to
    exempt. Final 1x1 detection convs are ALWAYS f32.
    """
    head_steps, n_head_blocks, n_finals = _head_plan(config)
    n_taps = 0
    if config.model.head == "fpn":
        n_taps = config.model.fpn_scales - 1
    elif getattr(config.model, "passthrough", False):
        n_taps = 1
    plan = conv_plan(config.model.backbone, n_taps=n_taps) + list(head_steps)
    bb_p = params["DarknetBackbone_0"]
    bb_s = batch_stats["DarknetBackbone_0"]
    scope = _head_scope(config)
    head_p = params[scope]
    head_s = batch_stats[scope]

    folded: List[Tuple[np.ndarray, np.ndarray]] = []
    ci = 0
    for step in plan:
        if step[0] != "conv":
            continue
        folded.append(_fold_convblock(bb_p[f"ConvBlock_{ci}"],
                                      bb_s[f"ConvBlock_{ci}"]))
        ci += 1
    for hi in range(n_head_blocks):
        folded.append(_fold_convblock(head_p[f"ConvBlock_{hi}"],
                                      head_s[f"ConvBlock_{hi}"]))

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
    # final 1x1 detection conv(s) stay f32 (full logit precision)
    for fi in range(n_finals):
        fp = head_p[f"Conv_{fi}"]
        layers.append({
            "w": jnp.asarray(np.asarray(fp["kernel"], np.float32)),
            "b": jnp.asarray(np.asarray(fp["bias"], np.float32)),
        })
    return tuple(plan), layers


_DN = ("NHWC", "HWIO", "NHWC")


def _quantize_act(x: jnp.ndarray, static_scale=None):
    """Symmetric activation quantization (f32 -> int8).

    Default: dynamic PER-IMAGE scales of shape (batch, 1, 1, 1) — one
    image's activation outliers must not coarsen every other image in the
    batch (a shared per-tensor dynamic scale measured -0.022 mAP on the
    flagship 0.783 checkpoint at eval batch 32; per-image scales also make
    batched eval equivalent to batch-1 serving).

    ``static_scale`` (a calibrated scalar, see
    ``calibrate_activation_scales``) switches to a fixed per-tensor scale
    whose saturating clip is MSE-optimal on the calibration set — outliers
    clip instead of coarsening the whole tensor's resolution.
    """
    if static_scale is not None:
        scale = static_scale
    else:
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
        padding = pad  # "SAME" (head convs)
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


def _mk_act(name: str):
    return ((lambda v: jax.nn.leaky_relu(v, 0.1))
            if name == "leaky_relu" else jax.nn.relu)


class _XState:
    """Lazily-quantized activation: at most one of (x f32, xq int8) is
    authoritative; ``xq`` goes stale after any conv and is re-quantized only
    when the next int8 consumer needs it. ``fq_done`` marks a fake-quant
    (QAT) tensor already quantize-dequantized pre-pool, so the next conv
    must not re-quantize it (mirrors the int8 path's pool-in-int8: one
    quantization with the PRE-pool scale)."""

    __slots__ = ("x", "xq", "scale", "fq_done")

    def __init__(self, x=None, xq=None, scale=None, fq_done=False):
        self.x, self.xq, self.scale = x, xq, scale
        self.fq_done = fq_done

    def f32(self):
        if self.x is None:
            self.x = self.xq.astype(jnp.float32) * self.scale  # exact dequant
        return self.x

    def quantized(self, layer):
        if self.xq is None:
            self.xq, self.scale = _quantize_act(self.x,
                                                layer.get("a_scale"))
        return self.xq, self.scale


def int8_forward(plan: Sequence[Tuple], layers, images_u8: jnp.ndarray,
                 grid: int, activation: str = "relu", calib: list = None,
                 head_activation: str = "relu"):
    """Quantized serving forward: u8 images -> grid tensor (conv/anchor/
    passthrough heads) or a per-scale grid tuple (fpn).

    Layer chain per conv: act quant (dynamic per-image, or static calibrated
    when the layer carries ``a_scale``) -> int8 conv -> f32 rescale + bias ->
    ReLU/LeakyReLU; 2x2/2 max-pools run on the int8 tensor of the NEXT
    layer's quantization (max commutes with a positive scale), saving 4x
    pool traffic. float_tail-kept layers (``w`` instead of ``w_q``) run in
    f32 on the unquantized activation — the quant boundary simply never
    materializes for them. Residual skips, taps, reorg/route/upsample/concat
    all run on the f32 view (layout/add ops, no MXU work).

    ``calib``: calibration mode (eager only) — every quantized conv runs in
    f32 with its DEQUANTIZED int8 kernel (serving's effective weights) and
    the f32 input activation is handed to ``calib.append`` via
    ``_optimal_act_scale``; no activation quantization is applied, so the
    recorded tensors are the float references the static scales must
    approximate.

    ``head_activation``: the HEAD ConvBlocks' nonlinearity. ConvHead and
    PassthroughConvHead hard-code ReLU regardless of the backbone knob
    (models/yolo.py:43-44, 71-83 — reference parity, ref model.py:247-263);
    FPNHead propagates the model activation (models/yolo.py:118-125), so
    the fpn caller passes it through.
    """
    act = _mk_act(activation)           # backbone ("conv") steps
    head_act = _mk_act(head_activation)  # head steps
    st = _XState()
    if "w_q" in layers[0] and calib is None:
        # first layer input is u8/255 in [0, 1]: scale is STATIC (1/127), so
        # the quantization is a pure integer rescale of the uint8 pixels
        st.xq = jnp.round(images_u8.astype(jnp.float32) * (127.0 / 255.0)
                          ).astype(jnp.int8)
        st.scale = jnp.float32(1.0 / 127.0)
    else:
        st.x = images_u8.astype(jnp.float32) / 255.0
    li = 0
    taps: Dict[int, jnp.ndarray] = {}
    res_stack: List[jnp.ndarray] = []
    outputs: List[jnp.ndarray] = []

    def conv_step(state, stride, pad, a=None):
        nonlocal li
        a = a or act
        layer = layers[li]
        li += 1
        if calib is not None:
            x = state.f32()
            if "w_q" in layer:
                calib.append(_optimal_act_scale(x))
                w = layer["w_q"].astype(jnp.float32) * layer["w_scale"]
                y = a(_f32_conv(x, {"w": w, "bias": layer["bias"]},
                                stride, pad))
            else:
                y = a(_f32_conv(x, layer, stride, pad))
        elif "w_q" in layer:
            xq, x_scale = state.quantized(layer)
            y = a(_int8_conv(xq, x_scale, layer, stride, pad))
        elif "w_fq" in layer:
            # QAT fake-quant path (export/qat.py): quantize-dequantize both
            # operands with straight-through gradients, then a plain f32 conv
            # — numerically the int8 serving conv, differentiably. A tensor
            # already fake-quantized pre-pool (fq_done) is consumed as-is,
            # like the int8 path consumes its pooled xq.
            from keras_object_detection_tpu.export.qat import (
                fake_quant_act, fake_quant_kernel)
            xf = (state.f32() if state.fq_done
                  else fake_quant_act(state.f32(), layer.get("a_scale")))
            y = a(_f32_conv(
                xf, {"w": fake_quant_kernel(layer["w_fq"]),
                     "bias": layer["bias"]}, stride, pad))
        else:
            y = a(_f32_conv(state.f32(), layer, stride, pad))
        return _XState(x=y)

    for step in plan:
        kind = step[0]
        if kind == "conv":
            _, k, stride, pad = step
            st = conv_step(st, stride, pad)
        elif kind == "pool":
            if (st.xq is None and calib is None
                    and li < len(layers) and "w_q" in layers[li]):
                # entering (or inside) the int8 regime: pool in int8
                st.quantized(layers[li])
            if (st.xq is None and not st.fq_done and calib is None
                    and li < len(layers) and "w_fq" in layers[li]):
                # QAT mirror of pool-in-int8: one quantize-dequantize with
                # the PRE-pool scale (max-pool commutes with a positive
                # scale), marked consumed so the next conv doesn't re-quant
                from keras_object_detection_tpu.export.qat import (
                    fake_quant_act)
                st = _XState(x=fake_quant_act(
                    st.f32(), layers[li].get("a_scale")), fq_done=True)
            if st.xq is not None:
                st.xq = lax.reduce_window(
                    st.xq, jnp.int8(-128), lax.max, (1, 2, 2, 1),
                    (1, 2, 2, 1), "VALID")
                st.x = None
            else:
                st.x = lax.reduce_window(
                    st.x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            continue
        elif kind == "res_begin":
            res_stack.append(st.f32())
        elif kind == "res_add":
            st = _XState(x=res_stack.pop() + st.f32())
        elif kind == "tap":
            taps[step[1]] = st.f32()
        elif kind == "head_conv":
            spatial = st.x.shape[1] if st.x is not None else st.xq.shape[1]
            st = conv_step(st, max(spatial // grid, 1), "SAME", head_act)
        elif kind == "conv_same":
            st = conv_step(st, 1, "SAME", head_act)
        elif kind == "tap_conv":
            # run the next ConvBlock on the saved passthrough tap; stash the
            # main feature, restore it at reorg_concat
            main = st
            st = conv_step(_XState(x=taps[0]), 1, "SAME", head_act)
            taps[0] = st.f32()
            st = main
        elif kind == "reorg_concat":
            from keras_object_detection_tpu.models.layers import (
                space_to_depth)
            x = st.f32()
            tap = taps[0]
            block = tap.shape[1] // x.shape[1]
            if block > 1:
                tap = space_to_depth(tap, block)
            st = _XState(x=jnp.concatenate([x, tap], axis=-1))
        elif kind in ("emit", "pred_emit"):
            br = st
            if kind == "pred_emit":
                # prediction branch off the trunk: the 2f 3x3 ConvBlock +
                # final conv see a COPY; st (the trunk) flows on to the route
                br = conv_step(_XState(x=st.x, xq=st.xq, scale=st.scale,
                                       fq_done=st.fq_done),
                               1, "SAME", head_act)
            final = layers[len(layers) - _n_finals(plan) + len(outputs)]
            outputs.append(lax.conv_general_dilated(
                br.f32(), final["w"], (1, 1), "VALID",
                dimension_numbers=_DN) + final["b"])
        elif kind == "route_up_concat":
            st = conv_step(st, 1, "SAME", head_act)  # the 1x1 route
            x = st.f32()
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            st = _XState(x=jnp.concatenate([x, taps[step[1]]], axis=-1))
        else:
            raise ValueError(f"unknown plan step {step!r}")
    return outputs[0] if len(outputs) == 1 else tuple(outputs)


def _n_finals(plan) -> int:
    return sum(1 for s in plan if s[0] in ("emit", "pred_emit"))


# ---------------------------------------------------------------------------
# Static activation calibration (ask: close the -0.018 int8 mAP gap).
# ---------------------------------------------------------------------------

_CLIP_RATIOS = np.concatenate([np.linspace(0.25, 1.0, 16)])


def _optimal_act_scale(x: jnp.ndarray) -> float:
    """Quantization-MSE-optimal symmetric scale for activation tensor ``x``.

    Sweeps saturating clip points ``r * absmax`` for r in [0.25, 1.0] and
    returns the scale minimizing E[(dequant(quant(x)) - x)^2] — the standard
    PTQ calibration objective: clipping a few outliers buys resolution for
    the bulk of the distribution."""
    x = x.astype(jnp.float32)
    absmax = float(jnp.max(jnp.abs(x)))
    if absmax <= 0:
        return 1.0 / 127.0
    best_scale, best_err = absmax / 127.0, None
    for r in _CLIP_RATIOS:
        scale = max(r * absmax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x / scale), -127, 127)
        err = float(jnp.mean(jnp.square(q * scale - x)))
        if best_err is None or err < best_err:
            best_err, best_scale = err, scale
    return float(best_scale)


def calibrate_activation_scales(config: Config, params: Any, batch_stats: Any,
                                images_u8: np.ndarray,
                                float_tail: int = 0) -> List[float]:
    """Per-conv static activation scales from a representative batch — the
    measured analogue of the reference's commented ``representative_dataset``
    int8 recipe (ref convert_to_tflite.py:9-13).

    Runs the folded network once in f32 (eagerly, with serving's dequantized
    int8 kernels so weight-quant error propagates into the recorded
    activations) and picks each quantized conv's input scale by the
    quantization-MSE sweep (``_optimal_act_scale``). Returns one scale per
    quantized conv in layer order; feed to ``apply_activation_scales``."""
    plan, layers = build_int8_layers(config, params, batch_stats,
                                     float_tail=float_tail)
    calib: List[float] = []
    g = config.grid
    activation = getattr(config.model, "activation", "relu")
    int8_forward(plan, layers, jnp.asarray(images_u8), g.grid, activation,
                 calib=calib,
                 head_activation=(activation if config.model.head == "fpn"
                                  else "relu"))
    return calib


def apply_activation_scales(layers, scales: Sequence[float]):
    """Attach calibrated static scales (``a_scale``) to the quantized convs
    of a ``build_int8_layers`` layer list, in order. Returns a new list."""
    scales = list(scales)
    out = []
    for layer in layers:
        if "w_q" in layer:
            layer = dict(layer, a_scale=jnp.float32(scales.pop(0)))
        out.append(layer)
    if scales:
        raise ValueError(f"{len(scales)} unused activation scales "
                         "(layer list mismatch)")
    return out


def bias_corrected_layers(config: Config, params: Any, batch_stats: Any,
                          images_u8, float_tail: int = 0,
                          act_scales: Optional[Sequence[float]] = None):
    """(plan, layers) with per-channel BIAS CORRECTION — the second offline
    PTQ quality lever after scale calibration (no fine-tuning needed).

    Quantization error has a non-zero per-channel mean (rounding interacts
    with the activation distribution), which shifts every downstream BN-less
    folded bias. The fix is classical post-training bias correction: walk
    the float and the int8 networks IN LOCKSTEP on a representative batch
    and, at each quantized conv, fold the mean pre-activation error
    ``E[y_float - y_int8]`` (a (cout,) vector) into the conv's bias. Later
    layers are corrected against the already-corrected earlier layers, so
    errors do not compound.

    ``act_scales``: optional static calibrated scales
    (``calibrate_activation_scales``) applied to the quantized branch first,
    so the correction targets exactly the configuration that will serve.

    Runs eagerly; intended for offline model preparation.
    """
    import dataclasses as _dc  # noqa: F401  (kept light; no config edits)

    plan, fl = build_int8_layers(config, params, batch_stats,
                                 float_tail=10 ** 9)
    _, ql = build_int8_layers(config, params, batch_stats,
                              float_tail=float_tail)
    if act_scales is not None:
        ql = apply_activation_scales(ql, act_scales)
    ql = [dict(l) for l in ql]
    g = config.grid
    activation = getattr(config.model, "activation", "relu")
    act = _mk_act(activation)
    head_act = _mk_act(activation if config.model.head == "fpn" else "relu")

    images = jnp.asarray(images_u8)
    xf = images.astype(jnp.float32) / 255.0
    if "w_q" in ql[0]:
        stq = _XState(
            xq=jnp.round(images.astype(jnp.float32) * (127.0 / 255.0)
                         ).astype(jnp.int8),
            scale=jnp.float32(1.0 / 127.0))
    else:
        stq = _XState(x=xf)
    li = 0
    taps_f: Dict[int, jnp.ndarray] = {}
    taps_q: Dict[int, jnp.ndarray] = {}
    stack_f: List[jnp.ndarray] = []
    stack_q: List[jnp.ndarray] = []

    def conv_pair(xf, stq, stride, pad, a):
        nonlocal li
        f, q = fl[li], ql[li]
        yf = _f32_conv(xf, f, stride, pad)
        if "w_q" in q:
            xq, xs = stq.quantized(q)
            yq = _int8_conv(xq, xs, q, stride, pad)
            delta = jnp.mean(yf - yq, axis=(0, 1, 2))
            ql[li] = dict(q, bias=q["bias"] + delta)
            yq = yq + delta
        else:
            yq = _f32_conv(stq.f32(), q, stride, pad)
        li += 1
        return a(yf), _XState(x=a(yq))

    for step in plan:
        kind = step[0]
        if kind == "conv":
            xf, stq = conv_pair(xf, stq, step[2], step[3], act)
        elif kind == "pool":
            xf = lax.reduce_window(xf, -jnp.inf, lax.max, (1, 2, 2, 1),
                                   (1, 2, 2, 1), "VALID")
            stq = _XState(x=lax.reduce_window(
                stq.f32(), -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID"))
        elif kind == "res_begin":
            stack_f.append(xf)
            stack_q.append(stq.f32())
        elif kind == "res_add":
            xf = stack_f.pop() + xf
            stq = _XState(x=stack_q.pop() + stq.f32())
        elif kind == "tap":
            taps_f[step[1]] = xf
            taps_q[step[1]] = stq.f32()
        elif kind == "head_conv":
            xf, stq = conv_pair(xf, stq, max(xf.shape[1] // g.grid, 1),
                                "SAME", head_act)
        elif kind == "conv_same":
            xf, stq = conv_pair(xf, stq, 1, "SAME", head_act)
        elif kind == "tap_conv":
            tf_, tq = conv_pair(taps_f[0], _XState(x=taps_q[0]), 1, "SAME",
                                head_act)
            taps_f[0], taps_q[0] = tf_, tq.f32()
        elif kind == "reorg_concat":
            from keras_object_detection_tpu.models.layers import (
                space_to_depth)
            tf_, tq = taps_f[0], taps_q[0]
            block = tf_.shape[1] // xf.shape[1]
            if block > 1:
                tf_, tq = space_to_depth(tf_, block), space_to_depth(tq, block)
            xf = jnp.concatenate([xf, tf_], axis=-1)
            stq = _XState(x=jnp.concatenate([stq.f32(), tq], axis=-1))
        elif kind in ("emit", "pred_emit"):
            if kind == "pred_emit":
                # correct the prediction-branch ConvBlock; the f32 final
                # conv needs no correction and its output is unused here
                conv_pair(xf, _XState(x=stq.x, xq=stq.xq, scale=stq.scale),
                          1, "SAME", head_act)
        elif kind == "route_up_concat":
            xf2, stq2 = conv_pair(xf, stq, 1, "SAME", head_act)
            xf2 = jnp.repeat(jnp.repeat(xf2, 2, axis=1), 2, axis=2)
            q2 = jnp.repeat(jnp.repeat(stq2.f32(), 2, axis=1), 2, axis=2)
            xf = jnp.concatenate([xf2, taps_f[step[1]]], axis=-1)
            stq = _XState(
                x=jnp.concatenate([q2, taps_q[step[1]]], axis=-1))
        else:
            raise ValueError(f"unknown plan step {step!r}")
    return plan, ql


class Int8InferenceModel:
    """Drop-in ``InferenceModel`` twin serving from folded int8 weights.

    Same fused forward+decode+NMS single-program surface; weights stream
    from HBM as int8 with no dequantized copy. ``memory_footprint`` reports
    the resident weight bytes vs the float equivalent.

    ``calib_images``: optional (N, H, W, 3) u8 representative batch —
    activations quantize with static MSE-calibrated per-tensor scales
    instead of dynamic per-image absmax (see
    ``calibrate_activation_scales``). ``act_quant`` overrides: "static"
    (requires calib_images) | "dynamic" | "auto" (static iff calib_images).
    ``bias_correct``: additionally fold the mean per-channel quantization
    error into each conv bias (``bias_corrected_layers``; requires
    calib_images).

    ``qat_steps``: > 0 runs a straight-through fake-quant distillation
    fine-tune of the folded weights against the float network before
    freezing to int8 (export/qat.py; requires calib_images) — the lever
    after PTQ calibration/bias-correction. Mutually exclusive with
    ``bias_correct`` (the distillation objective already absorbs the mean
    quantization error QAT-side).

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel batch
    serving, same semantics as ``InferenceModel(mesh=...)`` — batch shards
    over the data axis, each chip runs the full int8 program on its shard
    (``shard_map``), int8 weights replicate once."""

    def __init__(self, config: Config, params: Any, batch_stats: Any,
                 float_tail: int = 0,
                 calib_images: Optional[np.ndarray] = None,
                 bias_correct: bool = False, act_quant: str = "auto",
                 qat_steps: int = 0, qat_lr: float = 1e-5,
                 qat_batch: int = 8, mesh=None):
        self.config = config
        g = config.grid
        e = config.eval
        # head-aware decode, mirroring eval.evaluator.InferenceModel: the
        # folded int8 stack mirrors each head family's float structure —
        # only the grid decode differs per family
        fpn = config.model.head == "fpn"
        if fpn:
            from keras_object_detection_tpu.core.fpn import decode_fpn_grids
            anchors = tuple(tuple(a) for a in g.anchors)
            decode = lambda ys: decode_fpn_grids(  # noqa: E731
                ys, g.num_classes, anchors, g.grid, config.model.fpn_scales)
        elif config.model.head == "anchor":
            from keras_object_detection_tpu.core.anchors import (
                decode_anchor_grid)
            anchors = tuple(tuple(a) for a in g.anchors)
            decode = lambda y: decode_anchor_grid(  # noqa: E731
                y, g.num_classes, anchors, g.grid)
        else:
            decode = lambda y: decode_grid(  # noqa: E731
                y, g.num_classes, g.num_boxes, g.grid)
        if act_quant == "auto":
            act_quant = "static" if calib_images is not None else "dynamic"
        if act_quant not in ("static", "dynamic"):
            raise ValueError(f"act_quant {act_quant!r} not in "
                             "static|dynamic|auto")
        if (act_quant == "static" or bias_correct or qat_steps) \
                and calib_images is None:
            raise ValueError("static act_quant / bias_correct / qat_steps "
                             "need calib_images")
        if qat_steps and bias_correct:
            raise ValueError("qat_steps and bias_correct are mutually "
                             "exclusive (QAT's distillation already absorbs "
                             "the mean quantization error)")
        scales = (calibrate_activation_scales(
            config, params, batch_stats, calib_images,
            float_tail=float_tail) if act_quant == "static" else None)
        if qat_steps:
            from keras_object_detection_tpu.export.qat import qat_finetune

            plan, layers, self.qat_info = qat_finetune(
                config, params, batch_stats, calib_images, steps=qat_steps,
                lr=qat_lr, batch_size=qat_batch, float_tail=float_tail,
                act_scales=scales)
        elif bias_correct:
            plan, layers = bias_corrected_layers(
                config, params, batch_stats, calib_images,
                float_tail=float_tail, act_scales=scales)
        else:
            plan, layers = build_int8_layers(config, params, batch_stats,
                                             float_tail=float_tail)
            if scales is not None:
                layers = apply_activation_scales(layers, scales)
        self._mesh = mesh
        if mesh is not None:
            from keras_object_detection_tpu.parallel.mesh import (
                replicated_sharding)

            self._layers = jax.device_put(layers, replicated_sharding(mesh))
        else:
            self._layers = jax.device_put(layers)
        activation = getattr(config.model, "activation", "relu")
        # ConvHead/PassthroughConvHead hard-code ReLU (models/yolo.py:43-44);
        # FPNHead propagates the model activation (models/yolo.py:118-125)
        head_activation = activation if fpn else "relu"

        def forward(layers, images_u8):
            return int8_forward(plan, layers, images_u8, g.grid, activation,
                                head_activation=head_activation)

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
                boxes, e.iou_threshold, e.conf_threshold, e.max_candidates)

        from keras_object_detection_tpu.eval.evaluator import _serving_jit

        self._forward = _serving_jit(forward, config, mesh)
        self._forward_decode = _serving_jit(forward_decode, config, mesh)
        self._forward_decode_nms = _serving_jit(forward_decode_nms, config,
                                                mesh)
        # InferenceModel.benchmark_latency (borrowed below) passes
        # ``self._variables`` as the first jit argument; here that role is
        # played by the folded int8 layer list.
        self._variables = self._layers

    def predict_raw(self, images_u8):
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
                          staged: bool = False,
                          pipeline_k: int = 0) -> Dict[str, float]:
        """Shared timing harness (value-readback sync; see InferenceModel)."""
        from keras_object_detection_tpu.eval.evaluator import InferenceModel

        return InferenceModel.benchmark_latency(self, images_u8, runs=runs,
                                                staged=staged,
                                                pipeline_k=pipeline_k)


def select_serving_model(config: Config, params: Any, batch_stats: Any,
                         mode: str = "auto", probe_batch: int = 1,
                         probe_runs: int = 5,
                         calib_images: Optional[np.ndarray] = None,
                         **int8_kwargs):
    """Pick the serving path by MEASUREMENT, not hope.

    Int8 must win or step aside: on the relay-attached bench chip the int8
    path's batch-1 p50 measures 30.5 ms vs 25.1 ms float (both near the
    ~25 ms per-dispatch RTT floor; ``KOT_BENCH_INT8=1 python bench.py``), so
    defaulting to int8 would cost latency to save memory the serving host
    may not need. ``mode="auto"`` builds BOTH fused models, times each at
    ``probe_batch`` with the value-readback harness, and serves the faster;
    ``"float"``/``"int8"`` force a path (int8 still wins 4x on weight HBM
    residency — ``Int8InferenceModel.memory_footprint``).

    ``calib_images`` (forwarded to ``Int8InferenceModel``) switches the int8
    candidate to static calibrated activation scales.

    Returns ``(model, info)`` where ``info`` records the decision and, for
    auto, both measured p50s.
    """
    from keras_object_detection_tpu.eval.evaluator import InferenceModel

    if mode == "float":
        return InferenceModel(config, params, batch_stats), {"mode": "float"}
    if mode == "int8":
        return (Int8InferenceModel(config, params, batch_stats,
                                   calib_images=calib_images, **int8_kwargs),
                {"mode": "int8"})
    if mode != "auto":
        raise ValueError(f"serving mode {mode!r} not in float|int8|auto")

    fmodel = InferenceModel(config, params, batch_stats)
    qmodel = Int8InferenceModel(config, params, batch_stats,
                                calib_images=calib_images, **int8_kwargs)
    size = config.model.image_size
    probe = np.zeros((probe_batch, size, size, 3), np.uint8)
    f_p50 = fmodel.benchmark_latency(probe, runs=probe_runs)["p50_ms"]
    q_p50 = qmodel.benchmark_latency(probe, runs=probe_runs)["p50_ms"]
    info = {"mode": "auto", "probe_batch": probe_batch,
            "float_p50_ms": round(f_p50, 3), "int8_p50_ms": round(q_p50, 3),
            "chosen": "int8" if q_p50 <= f_p50 else "float"}
    return (qmodel if info["chosen"] == "int8" else fmodel), info
