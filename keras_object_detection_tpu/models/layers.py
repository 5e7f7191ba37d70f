"""Shared conv building blocks (parity target: ref yolo_v1/model.py:58-64
``cnn_block`` — ZeroPad -> Conv -> BatchNorm -> ReLU).

flax.linen modules with a ``dtype`` knob: activations/weights are cast to
bfloat16 on the forward path (MXU native) while parameters and batch stats
stay float32 (``param_dtype``) for stable training.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import dtypes as flax_dtypes

from keras_object_detection_tpu.ops.mxu_bn import mxu_bn_train
from keras_object_detection_tpu.ops.pallas_bn import fused_bn_train

Dtype = Any


class FusedBatchNorm(nn.Module):
    """flax.linen.BatchNorm drop-in whose training-mode batch statistics run
    through a custom single-pass path instead of XLA's convert+reduce chains —
    an attack on the profiled round-1 bottleneck (15.1 ms of a 41.7 ms step;
    ROADMAP.md) that turned out to be a NEGATIVE RESULT both ways: stock flax
    measures fastest end-to-end (48.5 vs 55.9 "mxu" vs 61.3 "pallas" ms/step),
    because the reduces already run at this chip's practical elementwise
    bandwidth and every custom path only adds barriers (details: ROADMAP.md).
    Kept opt-in for future hardware. ``stats`` selects the implementation:

    - ``"mxu"``: reductions as MXU dot-products (ops/mxu_bn.py) — pure XLA,
      no fusion barriers, but XLA canonicalizes the dots back into reduces,
    - ``"pallas"``: Pallas kernels (ops/pallas_bn.py) — the kernels are fast
      but ``pallas_call`` barriers cost more than they save.

    Variable layout (params scale/bias, batch_stats mean/var) and numerics
    (float32 stats, fast variance, float32 normalize arithmetic cast to
    ``dtype``) are identical to ``nn.BatchNorm`` with its defaults, so the two
    implementations are checkpoint-compatible — construct with an explicit
    ``name`` to keep the auto-naming identical when swapping.

    The eval path (running averages) has no reductions and stays in pure jnp.
    Note it computes in float32 and casts the result once at the end; with a
    bfloat16 module dtype, stock ``nn.BatchNorm`` instead promotes operands
    to bf16 and computes in bf16, so eval outputs can differ from flax in the
    last bf16 ulp per layer (strictly more accurate here, but NOT
    bit-identical — swap-in parity is tolerance-level, as asserted in the
    tests).
    """

    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    stats: str = "mxu"  # "mxu" | "pallas"
    # None = auto: compiled kernel on TPU, interpreter elsewhere (tests).
    # Only meaningful for stats="pallas".
    interpret: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        out_dtype = flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                   dtype=self.dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            y = (x.astype(jnp.float32) - mean) * mul + bias.astype(jnp.float32)
            return y.astype(out_dtype)

        if self.stats == "mxu":
            y, mean, var = mxu_bn_train(x, scale, bias, self.epsilon,
                                        out_dtype)
        else:
            interpret = self.interpret
            if interpret is None:
                interpret = jax.default_backend() in ("cpu", "gpu")
            y, mean, var = fused_bn_train(x, scale, bias, self.epsilon,
                                          out_dtype, interpret)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y


class SubsetStatsBatchNorm(nn.Module):
    """BatchNorm whose training-mode batch statistics are computed over only
    the FIRST ``stats_rows`` images of the batch (ghost-batch style) while
    every image is still normalized — an opt-in bandwidth lever: the profiled
    BN-stats reductions run at the memory wall (ROADMAP.md), and subsampling
    the stats cuts their activation reads by batch/stats_rows. Statistics
    from a batch subset are an unbiased (noisier) estimator; running
    averages, eval path, variable layout, and numerics order match
    ``nn.BatchNorm`` so checkpoints interchange freely."""

    stats_rows: int
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          self.param_dtype)
        out_dtype = flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                   dtype=self.dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            sub = x[: min(self.stats_rows, x.shape[0])].astype(jnp.float32)
            axes = tuple(range(sub.ndim - 1))
            mean = jnp.mean(sub, axis=axes)
            # fast variance (flax order): E[x^2] - E[x]^2
            var = jnp.mean(sub * sub, axis=axes) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean) * mul + bias.astype(jnp.float32)
        return y.astype(out_dtype)


def make_batch_norm(bn_mode: str, *, use_running_average: bool,
                    momentum: float = 0.99, epsilon: float = 1e-3,
                    dtype: Optional[Dtype] = None,
                    name: Optional[str] = None):
    """BatchNorm factory: ``"flax"`` = stock ``nn.BatchNorm`` (the measured
    fastest, the default), ``"mxu"`` = MXU dot-product stats, ``"fused"`` =
    Pallas-stats module (both measured net regressions, kept as opt-in
    experiments — see FusedBatchNorm docstring), ``"flax@N"`` = stock
    normalize with batch statistics over only the first N images
    (SubsetStatsBatchNorm, a bandwidth experiment). Pass ``name`` so variable
    trees stay identical across modes."""
    if "@" in bn_mode:
        base, rows = bn_mode.split("@", 1)
        if base != "flax" or not rows.isdigit() or int(rows) < 1:
            raise ValueError(f"bad bn_mode {bn_mode!r}; subset form is "
                             "'flax@N' with N >= 1")
        return SubsetStatsBatchNorm(stats_rows=int(rows),
                                    use_running_average=use_running_average,
                                    momentum=momentum, epsilon=epsilon,
                                    dtype=dtype, name=name)
    if bn_mode in ("mxu", "fused"):
        return FusedBatchNorm(use_running_average=use_running_average,
                              momentum=momentum, epsilon=epsilon, dtype=dtype,
                              stats="mxu" if bn_mode == "mxu" else "pallas",
                              name=name)
    if bn_mode == "flax":
        return nn.BatchNorm(use_running_average=use_running_average,
                            momentum=momentum, epsilon=epsilon, dtype=dtype,
                            param_dtype=jnp.float32, name=name)
    raise ValueError(
        f"unknown bn_mode {bn_mode!r}; options: mxu, fused, flax, flax@N")


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
    bn_mode: str = "flax"  # "fused" = Pallas BN stats | "flax" = stock BN

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
        x = make_batch_norm(
            self.bn_mode,
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            name="BatchNorm_0",  # keep flax auto-name across bn modes
        )(x)
        if self.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=0.1)
        return nn.relu(x)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool (ref model.py:74)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """YOLOv2 'reorg' layer: move ``block x block`` spatial tiles into the
    channel axis, ``(B, H, W, C) -> (B, H/block, W/block, C*block**2)``.

    Net-new for the anchor family's passthrough connection (arXiv:1612.08242
    §2 "passthrough layer"; the reference repo has no YOLOv2 model). Pure
    reshape/transpose, so XLA lowers it to a layout change — no data math.
    """
    b, h, w, c = x.shape
    if h % block or w % block:
        raise ValueError(f"spatial dims ({h},{w}) not divisible by {block}")
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)
