"""Keras-h5 -> flax pretrained-backbone weight conversion + grafting.

The reference's only working pipeline trains VGG16 initialized from ImageNet
(ref yolo_v1/yolo_v1.py:818 ``keras.applications.VGG16(include_top=False)``,
ref model.py:178 ``weights='imagenet'``, model.py:159 test_model) with
frozen/unfrozen ablation knobs (ref yolo_v1.py:819-820). This module provides
the TPU-native equivalent: a one-shot converter from a Keras model (or a
local ``.h5`` weights file — this container has no network, so ImageNet
weights arrive as a file) into the flax parameter trees of
``models/backbones.py``, plus a grafting helper for full-model variables.

The reference feeds 0-1-normalized RGB into VGG16 without
``preprocess_input`` (ref dataset.py:136-146 Normalize(0,1) straight into the
backbone), so conversion is a pure weight copy — no preprocessing shim.

Conversion is structural, keyed on the deterministic Keras layer order/names,
and is validated by forward-parity tests (Keras forward == flax forward on
identical weights, tests/test_pretrained.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import numpy as np

import jax.numpy as jnp

# Backbone registry name -> (top-level flax module key in params tree)
BACKBONE_PARAM_KEYS = {
    "darknet24": "DarknetBackbone_0",
    "darknet19": "DarknetBackbone_0",
    "darknet_tiny": "DarknetBackbone_0",
    "darknet_micro": "DarknetBackbone_0",
    "vgg16": "VGG16Backbone_0",
    "mobilenetv2": "MobileNetV2Backbone_0",
}


def _as_keras_model(source, builder):
    """Accept a live Keras model, a full-model .h5/.keras file, or a
    weights-only .h5 (loaded into a freshly built architecture)."""
    if not isinstance(source, (str, bytes)):
        return source  # already a keras.Model
    import tensorflow as tf  # local import: TF is test/tooling-only

    try:
        return tf.keras.models.load_model(source, compile=False)
    except Exception:
        model = builder()
        model.load_weights(source)
        return model


def _conv(kernel: np.ndarray, bias: Optional[np.ndarray] = None) -> Dict[str, Any]:
    out = {"kernel": jnp.asarray(kernel, jnp.float32)}
    if bias is not None:
        out["bias"] = jnp.asarray(bias, jnp.float32)
    return out


def _bn(weights) -> Dict[str, Dict[str, Any]]:
    gamma, beta, mean, var = weights
    return {
        "params": {"scale": jnp.asarray(gamma, jnp.float32),
                   "bias": jnp.asarray(beta, jnp.float32)},
        "batch_stats": {"mean": jnp.asarray(mean, jnp.float32),
                        "var": jnp.asarray(var, jnp.float32)},
    }


def keras_vgg16_to_flax(source) -> Dict[str, Any]:
    """Convert Keras VGG16 conv weights to a ``VGG16Backbone`` params tree.

    Keras and flax share the (H, W, in, out) conv kernel layout, and the 13
    convs appear in identical order (``block{i}_conv{j}`` -> ``Conv_{k}``).
    Returns ``{"params": {...}}`` (VGG16 has no batch stats).
    """
    def builder():
        import tensorflow as tf

        return tf.keras.applications.VGG16(weights=None, include_top=False)

    model = _as_keras_model(source, builder)
    params: Dict[str, Any] = {}
    idx = 0
    for layer in model.layers:
        weights = layer.get_weights()
        if layer.__class__.__name__ == "Conv2D":
            kernel, bias = weights
            params[f"Conv_{idx}"] = _conv(kernel, bias)
            idx += 1
    if idx != 13:
        raise ValueError(f"expected 13 VGG16 convs, found {idx}")
    return {"params": params}


def keras_mobilenetv2_to_flax(source) -> Dict[str, Any]:
    """Convert Keras MobileNetV2 (alpha=1.0) weights to a
    ``MobileNetV2Backbone`` variables tree (params + batch_stats).

    Layout notes:
    - Keras ``DepthwiseConv2D`` kernels are (k, k, C, 1); flax grouped convs
      (``feature_group_count=C``) use (k, k, 1, C) — transposed here.
    - Keras block ordering (``expanded_conv``, ``block_1`` .. ``block_16``)
      maps 1:1 onto ``_InvertedResidual_0`` .. ``_InvertedResidual_16``.
    - BN gamma/beta/moving_mean/moving_variance -> scale/bias + batch_stats.
    """
    def builder():
        import tensorflow as tf

        return tf.keras.applications.MobileNetV2(weights=None, include_top=False)

    model = _as_keras_model(source, builder)
    layers = {layer.name: layer for layer in model.layers}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(scope: Dict[str, Any], stat_scope: Dict[str, Any],
            flax_name: str, keras_name: str, kind: str):
        layer = layers[keras_name]
        w = layer.get_weights()
        if kind == "conv":
            scope[flax_name] = _conv(w[0], w[1] if len(w) > 1 else None)
        elif kind == "dwconv":
            scope[flax_name] = _conv(np.transpose(w[0], (0, 1, 3, 2)))
        else:  # bn
            converted = _bn(w)
            scope[flax_name] = converted["params"]
            stat_scope[flax_name] = converted["batch_stats"]

    # stem
    put(params, stats, "Conv_0", "Conv1", "conv")
    put(params, stats, "BatchNorm_0", "bn_Conv1", "bn")

    # inverted residual blocks
    for i in range(17):
        prefix = "expanded_conv" if i == 0 else f"block_{i}"
        bparams: Dict[str, Any] = {}
        bstats: Dict[str, Any] = {}
        conv_idx = 0
        bn_idx = 0
        if f"{prefix}_expand" in layers:
            put(bparams, bstats, f"Conv_{conv_idx}", f"{prefix}_expand", "conv")
            put(bparams, bstats, f"BatchNorm_{bn_idx}",
                f"{prefix}_expand_BN", "bn")
            conv_idx += 1
            bn_idx += 1
        put(bparams, bstats, f"Conv_{conv_idx}", f"{prefix}_depthwise", "dwconv")
        put(bparams, bstats, f"BatchNorm_{bn_idx}",
            f"{prefix}_depthwise_BN", "bn")
        conv_idx += 1
        bn_idx += 1
        put(bparams, bstats, f"Conv_{conv_idx}", f"{prefix}_project", "conv")
        put(bparams, bstats, f"BatchNorm_{bn_idx}",
            f"{prefix}_project_BN", "bn")
        params[f"_InvertedResidual_{i}"] = bparams
        stats[f"_InvertedResidual_{i}"] = bstats

    # final 1x1 conv to 1280
    put(params, stats, "Conv_1", "Conv_1", "conv")
    put(params, stats, "BatchNorm_1", "Conv_1_bn", "bn")

    return {"params": params, "batch_stats": stats}


_CONVERTERS = {
    "vgg16": keras_vgg16_to_flax,
    "mobilenetv2": keras_mobilenetv2_to_flax,
}


def load_pretrained_backbone(variables: Dict[str, Any], backbone: str,
                             source: Union[str, Any]) -> Dict[str, Any]:
    """Return ``variables`` with the backbone subtree replaced by converted
    Keras weights (ref model.py:178 ``weights='imagenet'`` parity).

    ``variables`` is the full model's ``{"params": ..., "batch_stats": ...}``;
    ``source`` is a Keras model or an .h5 path — or, for darknet backbones,
    an original darknet ``.weights`` / ``.conv.NN`` file
    (models/darknet_import.py), so ``--pretrained-backbone`` covers the
    official ImageNet backbones of all three families. Shapes are validated
    leaf by leaf against the initialized tree.
    """
    if backbone.startswith("darknet"):
        from keras_object_detection_tpu.models.darknet_import import (
            load_darknet_backbone)

        out = dict(variables)
        params, stats, info = load_darknet_backbone(
            dict(out["params"]), dict(out.get("batch_stats", {})),
            source)
        print(f"darknet import: {info['loaded_convs']}/"
              f"{info['total_convs']} convs from {source} "
              f"(version {info['version']}, seen {info['seen']})")
        out["params"], out["batch_stats"] = params, stats
        return out
    if backbone not in _CONVERTERS:
        raise ValueError(
            f"no pretrained converter for backbone {backbone!r}; "
            f"options: {sorted(_CONVERTERS)}")
    key = BACKBONE_PARAM_KEYS[backbone]
    converted = _CONVERTERS[backbone](source)

    import jax

    def check(old, new, collection):
        flat_old = jax.tree_util.tree_flatten_with_path(old)[0]
        flat_new = dict(jax.tree_util.tree_flatten_with_path(new)[0])
        for path, leaf in flat_old:
            if path not in flat_new:
                raise ValueError(f"{collection}: missing converted leaf {path}")
            if flat_new[path].shape != leaf.shape:
                raise ValueError(
                    f"{collection}{jax.tree_util.keystr(path)}: shape "
                    f"{flat_new[path].shape} != expected {leaf.shape}")

    out = dict(variables)
    params = dict(out["params"])
    check(params[key], converted["params"], "params")
    params[key] = converted["params"]
    out["params"] = params
    if "batch_stats" in converted:
        stats = dict(out.get("batch_stats", {}))
        check(stats.get(key, {}), converted["batch_stats"], "batch_stats")
        stats[key] = converted["batch_stats"]
        out["batch_stats"] = stats
    return out
