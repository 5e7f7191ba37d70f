"""Quantization-aware fine-tuning (QAT) for the int8 serving path.

The PTQ ladder in export/int8_serving.py (dynamic scales -> MSE-calibrated
static scales -> per-channel bias correction) is purely post-hoc: the folded
weights never move. QAT is the next lever when PTQ leaves an mAP gap — the
standard straight-through-estimator (STE) fake-quant fine-tune:

- the student network is the BN-FOLDED float network (``build_int8_layers``
  with an all-float tail), with every conv that will serve int8 flagged
  ``w_fq``: its kernel and input activation are quantize-dequantized inside
  the forward (``fake_quant_kernel`` / ``fake_quant_act``), so the f32 math
  sees exactly the serving path's quantization grid while gradients pass
  straight through the rounding (``x + stop_gradient(qdq(x) - x)``);
- the objective is self-distillation on a representative u8 batch: MSE
  between the student's grid logits and the FLOAT folded network's (the
  teacher) — no labels needed, and the optimum is literally "the quantized
  network that best reproduces the float network's detections";
- after ``steps`` Adam updates the tuned weights freeze back to true int8
  serving layers (``freeze_qat_layers``), bit-compatible with
  ``int8_forward``'s s8 x s8 -> s32 path.

The reference's int8 story stops at a commented-out PTQ recipe (ref
convert_to_tflite.py:17-30); this module goes one rung further. Wired into
``Int8InferenceModel(qat_steps=N, calib_images=...)`` and measured by
``tools/ptq_delta.py --qat N``.

Fake-quant semantics mirror serving exactly: per-output-channel symmetric
int8 kernels (``_quantize_kernel``'s grid), per-image dynamic or calibrated
static per-tensor activation scales, and the first conv's input pinned to
the static u8-pixel scale 1/127 that ``int8_forward`` hard-codes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.export.int8_serving import (
    _quantize_kernel,
    build_int8_layers,
    int8_forward,
)

_INPUT_SCALE = 1.0 / 127.0  # int8_forward's static u8-input scale


def fake_quant_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Per-output-channel symmetric int8 quantize-dequantize with STE.

    Same grid as ``_quantize_kernel`` (absmax/127 per cout); the scale is
    recomputed from the live weights each step (stop-gradded), so the weight
    can move its own quantization grid during fine-tuning."""
    absmax = jnp.max(jnp.abs(w).reshape(-1, w.shape[-1]), axis=0)
    scale = lax.stop_gradient(jnp.maximum(absmax, 1e-12) / 127.0)
    qdq = jnp.clip(jnp.round(w / scale), -127, 127) * scale
    return w + lax.stop_gradient(qdq - w)


def fake_quant_act(x: jnp.ndarray, static_scale=None) -> jnp.ndarray:
    """Symmetric activation quantize-dequantize with STE — dynamic per-image
    absmax scales by default, or a calibrated static per-tensor scale,
    matching ``_quantize_act``'s serving semantics."""
    if static_scale is None:
        scale = jnp.maximum(
            jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    else:
        scale = jnp.asarray(static_scale, jnp.float32)
    scale = lax.stop_gradient(scale)
    qdq = jnp.clip(jnp.round(x / scale), -127, 127) * scale
    return x + lax.stop_gradient(qdq - x)


def qat_layers(config: Config, params: Any, batch_stats: Any,
               float_tail: int = 0,
               act_scales: Optional[Sequence[float]] = None):
    """(plan, student_layers): the BN-folded float network with serving's
    quantized convs flagged ``w_fq`` for fake-quant.

    ``act_scales`` (from ``calibrate_activation_scales``) pins static
    per-tensor activation scales; omitted, activations fake-quant with
    dynamic per-image scales. Either way the FIRST conv's input scale is the
    serving path's static 1/127 (see ``int8_forward``'s u8 ingest)."""
    plan, fl = build_int8_layers(config, params, batch_stats,
                                 float_tail=10 ** 9)
    _, ql = build_int8_layers(config, params, batch_stats,
                              float_tail=float_tail)
    scales = list(act_scales) if act_scales is not None else None
    student: List[Dict[str, Any]] = []
    for i, (f, q) in enumerate(zip(fl, ql)):
        if "w_q" not in q:
            student.append(dict(q))  # float_tail convs + f32 finals, as-is
            continue
        if scales is None:
            s = None
        elif scales:
            s = scales.pop(0)
        else:
            raise ValueError("act_scales ran out before the quantized convs "
                             "did (layer list mismatch — was it calibrated "
                             "with a different float_tail?)")
        if i == 0:
            s = _INPUT_SCALE
        layer = {"w_fq": f["w"], "bias": f["bias"]}
        if s is not None:
            layer["a_scale"] = jnp.float32(s)
        student.append(layer)
    if scales:
        raise ValueError(f"{len(scales)} unused activation scales "
                         "(layer list mismatch)")
    return plan, student


def freeze_qat_layers(layers) -> list:
    """Quantize the fine-tuned ``w_fq`` kernels back to true int8 serving
    layers (``w_q``/``w_scale``), preserving biases and static scales —
    ready for ``int8_forward``'s s8 x s8 -> s32 path."""
    out = []
    for layer in layers:
        if "w_fq" in layer:
            q, ws = _quantize_kernel(np.asarray(layer["w_fq"], np.float32))
            frozen = {"w_q": jnp.asarray(q), "w_scale": jnp.asarray(ws),
                      "bias": layer["bias"]}
            if "a_scale" in layer:
                frozen["a_scale"] = layer["a_scale"]
            out.append(frozen)
        else:
            out.append(dict(layer))
    return out


def qat_finetune(config: Config, params: Any, batch_stats: Any,
                 images_u8: np.ndarray, *, steps: int = 256,
                 lr: float = 1e-5, batch_size: int = 8,
                 float_tail: int = 0,
                 act_scales: Optional[Sequence[float]] = None,
                 seed: int = 0) -> Tuple[tuple, list, Dict[str, Any]]:
    """Distill the float folded network into its fake-quant twin, then
    freeze to int8. Returns ``(plan, serving_layers, info)``.

    ``images_u8``: (N, H, W, 3) representative batch (the same array handed
    to ``calibrate_activation_scales`` works). ``info`` records the first /
    last / best full-set distillation losses and the step the frozen
    (keep-best) weights came from — ``last_loss > best_loss`` means the
    fine-tune diverged after its best point (lower ``lr``)."""
    plan, teacher = build_int8_layers(config, params, batch_stats,
                                      float_tail=10 ** 9)
    _, student = qat_layers(config, params, batch_stats,
                            float_tail=float_tail, act_scales=act_scales)
    g = config.grid.grid
    activation = getattr(config.model, "activation", "relu")
    head_activation = (activation if config.model.head == "fpn" else "relu")

    def forward(layers, imgs):
        out = int8_forward(plan, layers, imgs, g, activation,
                           head_activation=head_activation)
        return out if isinstance(out, tuple) else (out,)

    teacher_fwd = jax.jit(forward)
    tx = optax.adam(lr)
    opt_state = tx.init(student)

    def batch_loss(layers, imgs, targets):
        outs = forward(layers, imgs)
        return sum(jnp.mean(jnp.square(o - t))
                   for o, t in zip(outs, targets)) / len(outs)

    eval_loss = jax.jit(batch_loss)

    @jax.jit
    def train_step(layers, opt_state, imgs, targets):
        loss, grads = jax.value_and_grad(batch_loss)(layers, imgs, targets)
        updates, opt_state = tx.update(grads, opt_state, layers)
        return optax.apply_updates(layers, updates), opt_state, loss

    images_u8 = np.asarray(images_u8)
    n = len(images_u8)
    batch_size = min(batch_size, n)
    # fixed minibatch partition: teacher targets computed ONCE per batch,
    # the step loop cycles through the batches (a shuffled rep set is the
    # caller's choice; distillation needs coverage, not sampling noise)
    order = np.random.RandomState(seed).permutation(n)
    batches = [order[i:i + batch_size]
               for i in range(0, n - batch_size + 1, batch_size)]
    if n % batch_size:
        # cover the remainder with a static-shape tail batch (overlaps the
        # previous one rather than triggering a second jit shape)
        batches.append(order[n - batch_size:])
    cached: List[Tuple[jnp.ndarray, tuple]] = []
    for idx in batches:
        imgs = jnp.asarray(images_u8[idx])
        cached.append((imgs, tuple(
            lax.stop_gradient(t) for t in teacher_fwd(teacher, imgs))))

    def full_loss(layers) -> float:
        return float(np.mean([float(eval_loss(layers, i, t))
                              for i, t in cached]))

    # keep-best over full-set evals, SEEDED with the untouched PTQ student:
    # qat_finetune can never return a quantized network worse (on the rep
    # set) than the one PTQ would have served
    first_loss = full_loss(student)
    best_loss, best_student, best_step = first_loss, student, 0
    last_loss = first_loss
    eval_every = max(1, steps // 8)
    for step in range(steps):
        imgs, targets = cached[step % len(cached)]
        student, opt_state, _ = train_step(student, opt_state, imgs, targets)
        if (step + 1) % eval_every == 0 or step + 1 == steps:
            last_loss = full_loss(student)
            if last_loss < best_loss:
                best_loss, best_student, best_step = (last_loss, student,
                                                      step + 1)
    info = {"steps": int(steps), "lr": float(lr),
            "batch_size": int(batch_size),
            "first_loss": first_loss,
            "last_loss": last_loss,   # the FINAL optimizer state's loss
            "best_loss": best_loss,   # what freeze_qat_layers receives
            "best_step": int(best_step)}
    return plan, freeze_qat_layers(best_student), info
