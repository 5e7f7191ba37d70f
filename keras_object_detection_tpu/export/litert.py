"""Model export (parity target: ref yolo_v1/convert_to_tflite.py).

Two paths:
- ``export_tflite``: StableHLO -> TF SavedModel function (jax2tf) -> LiteRT
  flatbuffer, including the full-int8 PTQ recipe the reference left commented
  out (ref convert_to_tflite.py:17-30: Optimize.DEFAULT + representative
  dataset + TFLITE_BUILTINS_INT8 + uint8 I/O). Requires TensorFlow.
- ``export_stablehlo``: TF-free serialization via ``jax.export`` — the
  portable StableHLO artifact for other runtimes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.models.yolo import build_model


def _make_serving_fn(config: Config, params: Any, batch_stats: Any,
                     batch_size: int = 1) -> Callable:
    # Export in float32 regardless of the training compute dtype: params are
    # f32 either way (bf16 is activations-only), and bf16 ops in the exported
    # graph break LiteRT full-int8 legalization (bf16 tfl.pad is not
    # quantizable -> "failed to legalize operation 'tfl.pad'").
    if config.model.compute_dtype != "float32":
        config = dataclasses.replace(
            config,
            model=dataclasses.replace(config.model, compute_dtype="float32"))
    model = build_model(config)
    g = config.grid
    variables = {"params": params, "batch_stats": batch_stats}

    if config.model.head == "fpn":
        # Multi-scale head: one output per scale, coarse -> fine — LiteRT
        # and jax.export both carry multi-output graphs natively. Decode
        # (core/fpn.decode_fpn_grids) stays outside the artifact, matching
        # the single-grid exports, which also emit raw grid predictions.
        from keras_object_detection_tpu.core.fpn import (
            fpn_grid_sizes, partition_anchors)
        parts = partition_anchors(g.anchors, config.model.fpn_scales)
        depth = len(parts[0]) * (5 + g.num_classes)
        sizes = fpn_grid_sizes(g.grid, config.model.fpn_scales)

        def serve_fpn(images: jnp.ndarray):
            """float32 [0,1] images -> tuple of (batch, S_s, S_s,
            B_s*(5+C)) per-scale grids, coarse -> fine."""
            ys = model.apply(variables, images, train=False)
            return tuple(y.reshape((-1, s, s, depth))
                         for y, s in zip(ys, sizes))

        return serve_fpn

    out_shape = (g.grid, g.grid, g.head_depth(config.model.head))

    def serve(images: jnp.ndarray) -> jnp.ndarray:
        """float32 [0,1] images -> (batch, S, S, depth) grid predictions."""
        y = model.apply(variables, images, train=False)
        return y.reshape((-1,) + out_shape)

    return serve


def default_representative_dataset(config: Config,
                                   num_samples: int = 100) -> Callable:
    """Random calibration stream, same recipe as ref convert_to_tflite.py:9-13
    (100 x uniform random 1xHxWx3 float32)."""
    size = config.model.image_size

    def gen() -> Iterator:
        rng = np.random.RandomState(0)
        for _ in range(num_samples):
            yield [rng.rand(1, size, size, 3).astype(np.float32)]

    return gen


def export_tflite(
    config: Config,
    params: Any,
    batch_stats: Any,
    output_path: str,
    quantize_int8: bool = False,
    representative_dataset: Optional[Callable] = None,
    batch_size: int = 1,
) -> bytes:
    """Convert the model to a ``.tflite`` flatbuffer and write it.

    Returns the flatbuffer bytes (also written to ``output_path``).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    serve = _make_serving_fn(config, params, batch_stats, batch_size)
    size = config.model.image_size
    tf_fn = tf.function(
        jax2tf.convert(serve, with_gradient=False),
        input_signature=[
            tf.TensorSpec([batch_size, size, size, 3], tf.float32, name="images")
        ],
        autograph=False,
    )
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [tf_fn.get_concrete_function()])
    if quantize_int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = (
            representative_dataset or default_representative_dataset(config))
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
        converter.target_spec.supported_types = [tf.int8]
        converter.inference_input_type = tf.uint8
        converter.inference_output_type = tf.uint8
    flatbuffer = converter.convert()
    with open(output_path, "wb") as f:
        f.write(flatbuffer)
    return flatbuffer


def export_stablehlo(
    config: Config,
    params: Any,
    batch_stats: Any,
    output_path: str,
    batch_size: int = 1,
) -> bytes:
    """Serialize the serving function as portable StableHLO bytes."""
    serve = _make_serving_fn(config, params, batch_stats, batch_size)
    size = config.model.image_size
    exported = jax.export.export(jax.jit(serve))(
        jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.float32))
    blob = exported.serialize()
    with open(output_path, "wb") as f:
        f.write(blob)
    return blob
