"""Inference and evaluation (parity targets: ref yolo_v1/evaluate.py — the
fused model+decode inference graph and its latency micro-benchmark — and the
post-fit test evaluation of ref train.py:244-259).

The reference fuses decode into the serving graph with a Keras ``Lambda``
layer but still runs NMS in a graph-looped ``tf.while`` (host-paced); here
forward + decode + batched NMS are ONE jit program — nothing dynamic leaves
the device until the final (N, 6) box array.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import Config
from keras_object_detection_tpu.core.grid import decode_grid
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.models.yolo import build_model
from keras_object_detection_tpu.ops.map import MeanAveragePrecision
from keras_object_detection_tpu.ops.pallas_nms import (
    auto_batched_non_max_suppression as batched_non_max_suppression,
)
from keras_object_detection_tpu.train.loop import (TrainState, make_eval_step,
                                                   run_dataset_eval)


def _serving_jit(fn, config: Config, mesh):
    """jit ``fn(weights, images)`` — single-device, or batch-sharded over
    ``mesh``'s data axis via ``shard_map`` (each chip runs the whole fused
    program, Pallas kernels included, on its batch shard; weights are
    replicated). Shared by the float and int8 serving models."""
    if mesh is None:
        return jax.jit(fn)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    da = config.mesh.data_axis
    dp = mesh.shape[da]
    sharded = jax.jit(shard_map(
        fn, mesh=mesh, in_specs=(P(), P(da)), out_specs=P(da),
        check_vma=False))

    def call(weights, images):
        if images.shape[0] % dp:
            raise ValueError(
                f"serving batch {images.shape[0]} must divide by the mesh "
                f"data axis {da}={dp} (pad the batch or drop the mesh)")
        return sharded(weights, images)

    return call


class InferenceModel:
    """Fused forward + decode (+ NMS) serving path.

    ``predict_decoded`` mirrors the reference's ``inference_model``
    (ref evaluate.py:24-28): raw grid output decoded to (batch, S*S, 6).
    ``predict`` goes further and returns NMS-filtered boxes — the full
    on-device post-processing the reference runs host-paced.

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel batch
    serving — the batch shards over the mesh's data axis and every chip
    runs the COMPLETE fused forward+decode+NMS program on its shard
    (``shard_map``, so the Pallas NMS kernel runs per-chip instead of
    fighting GSPMD partitioning); weights replicate once at construction.
    Serving is embarrassingly batch-parallel (no cross-image op anywhere in
    the program), so throughput scales with the mesh while per-call
    semantics stay bit-identical to single-chip. Batch sizes must divide
    the data-axis size.
    """

    def __init__(self, config: Config, params: Any, batch_stats: Any,
                 mesh=None):
        self.config = config
        model = build_model(config)
        g = config.grid
        e = config.eval
        # Variables are jit ARGUMENTS, not closure captures — capturing them
        # would bake ~180 MB of weights into the HLO as literals. device_put
        # once at construction: checkpoint-restored params arrive as HOST
        # numpy arrays, and without this every serving call re-uploads the
        # full weight set (measured 4.9 s/call through the relay's ~73 MB/s
        # transfer path vs 25 ms with device-resident weights).
        if mesh is not None:
            from keras_object_detection_tpu.parallel.mesh import (
                replicated_sharding)

            self._variables = jax.device_put(
                {"params": params, "batch_stats": batch_stats},
                replicated_sharding(mesh))
        else:
            self._variables = jax.device_put(
                {"params": params, "batch_stats": batch_stats})
        fpn = config.model.head == "fpn"
        if fpn:
            # per-scale grid tuple out of the model; decode concatenates the
            # scales into one candidate set (core/fpn.py) — NMS/TTA unchanged
            from keras_object_detection_tpu.core.fpn import decode_fpn_grids
            anchors = tuple(tuple(a) for a in g.anchors)
            self._decode = lambda ys: decode_fpn_grids(
                ys, g.num_classes, anchors, g.grid, config.model.fpn_scales)
        elif config.model.head == "anchor":
            from keras_object_detection_tpu.core.anchors import (
                decode_anchor_grid)
            anchors = tuple(tuple(a) for a in g.anchors)
            self._decode = lambda y: decode_anchor_grid(
                y, g.num_classes, anchors, g.grid)
        else:
            self._decode = lambda y: decode_grid(
                y, g.num_classes, g.num_boxes, g.grid)
        out_shape = None if fpn else (
            g.grid, g.grid, g.head_depth(config.model.head))

        def forward(variables, images_u8):
            x = images_u8.astype(jnp.float32) / 255.0
            y = model.apply(variables, x, train=False)
            return y if out_shape is None else y.reshape((-1,) + out_shape)

        def forward_decode(variables, images_u8):
            boxes = self._decode(forward(variables, images_u8))
            if e.tta == "hflip":
                # TTA: forward the mirror in the SAME jit program, un-flip
                # its detections (cx -> 1-cx; layout [cls, conf, cx, cy,
                # w, h]) and hand NMS the union — 2*S*S candidates.
                fb = self._decode(forward(variables, images_u8[:, :, ::-1, :]))
                fb = fb.at[..., 2].set(1.0 - fb[..., 2])
                boxes = jnp.concatenate([boxes, fb], axis=1)
            elif e.tta != "none":
                raise ValueError(f"unknown EvalConfig.tta {e.tta!r} "
                                 "(expected 'none' or 'hflip')")
            return boxes

        def forward_decode_nms(variables, images_u8):
            boxes = forward_decode(variables, images_u8)
            if e.nms_mode != "hard":  # opt-in Soft-/Fast-NMS serving
                from keras_object_detection_tpu.ops.nms import (
                    batched_fast_non_max_suppression,
                    batched_soft_non_max_suppression, top_k_candidates)

                if e.max_candidates and boxes.shape[1] > e.max_candidates:
                    boxes = top_k_candidates(boxes, e.max_candidates)
                if e.nms_mode == "fast":
                    return batched_fast_non_max_suppression(
                        boxes, e.iou_threshold, e.conf_threshold)
                return batched_soft_non_max_suppression(
                    boxes, e.iou_threshold, e.conf_threshold,
                    e.soft_nms_sigma, e.nms_mode.removeprefix("soft_"))
            return batched_non_max_suppression(
                boxes, e.iou_threshold, e.conf_threshold, e.max_candidates)

        self._mesh = mesh
        self._forward = _serving_jit(forward, config, mesh)
        self._forward_decode = _serving_jit(forward_decode, config, mesh)
        self._forward_decode_nms = _serving_jit(forward_decode_nms, config,
                                                mesh)

    def predict_raw(self, images_u8) -> jnp.ndarray:
        return self._forward(self._variables, jnp.asarray(images_u8))

    def predict_decoded(self, images_u8) -> jnp.ndarray:
        return self._forward_decode(self._variables, jnp.asarray(images_u8))

    def predict(self, images_u8) -> Tuple[np.ndarray, np.ndarray]:
        boxes, valid = self._forward_decode_nms(
            self._variables, jnp.asarray(images_u8))
        return np.asarray(boxes), np.asarray(valid)

    def predict_single(self, image_u8) -> np.ndarray:
        """One image -> (num_kept, 6) boxes, the reference's NMS output shape."""
        boxes, valid = self.predict(np.asarray(image_u8)[None])
        return boxes[0][valid[0]]

    def benchmark_latency(self, images_u8, runs: int = 5,
                          staged: bool = False,
                          pipeline_k: int = 0) -> Dict[str, float]:
        """Timed serving runs (ref evaluate.py:37-47's two timed variants).

        ``staged=False`` times the fused forward+decode+NMS graph;
        ``staged=True`` times the reference's 'raw model + separate
        post-processing' style — three dispatches instead of one.
        ``pipeline_k > 0`` additionally reports ``pipelined_per_call_ms``
        (K async dispatches, one readback — the device-time upper bound).
        """
        x = jnp.asarray(images_u8)

        if staged and getattr(self, "_mesh", None) is not None:
            raise ValueError("staged latency benchmarking is a single-device "
                             "diagnostic; construct the model with mesh=None")
        if staged:
            from keras_object_detection_tpu.ops.pallas_nms import (
                auto_batched_non_max_suppression as _nms)

            e = self.config.eval
            decode = jax.jit(self._decode)  # head-aware (v1 or anchor)
            if e.nms_mode != "hard":  # keep staged/fused variants comparable
                from keras_object_detection_tpu.ops.nms import (
                    batched_fast_non_max_suppression as _fast,
                    batched_soft_non_max_suppression as _soft,
                    top_k_candidates as _topk)

                def _alt_nms(b):
                    if e.max_candidates and b.shape[1] > e.max_candidates:
                        b = _topk(b, e.max_candidates)
                    if e.nms_mode == "fast":
                        return _fast(b, e.iou_threshold, e.conf_threshold)
                    return _soft(b, e.iou_threshold, e.conf_threshold,
                                 e.soft_nms_sigma,
                                 e.nms_mode.removeprefix("soft_"))

                nms = jax.jit(_alt_nms)
            else:
                nms = jax.jit(
                    lambda b: _nms(b, e.iou_threshold, e.conf_threshold,
                                   e.max_candidates))

            if e.tta == "hflip":
                # keep staged/fused comparable: the staged variant pays the
                # mirror forward + un-flip + union too
                unflip = jax.jit(lambda b: b.at[..., 2].set(1.0 - b[..., 2]))
                concat = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=1))

                def run(x):
                    d = decode(self._forward(self._variables, x))
                    df = unflip(decode(
                        self._forward(self._variables, x[:, :, ::-1, :])))
                    return nms(concat(d, df))
            else:
                def run(x):
                    return nms(decode(self._forward(self._variables, x)))
        else:
            def run(x):
                return self._forward_decode_nms(self._variables, x)

        # Sync with a VALUE READBACK, not block_until_ready: on the axon
        # relay platform block_until_ready has been observed to return before
        # execution completes (phantom timings — the same bug bench.py:60
        # guards against). The validity mask is tiny (batch x 49 bool), so
        # the readback itself adds only the unavoidable host round-trip that
        # a real serving client pays anyway.
        def run_synced(x):
            out = run(x)
            np.asarray(out[-1])  # forces completion of the whole program

        run_synced(x)  # compile + warmup
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            run_synced(x)
            times.append((time.perf_counter() - t0) * 1000)
        times.sort()
        out = {
            "p50_ms": times[len(times) // 2],
            "min_ms": times[0],
            "mean_ms": sum(times) / len(times),
            "batch": int(x.shape[0]),
        }
        if pipeline_k:
            # K async dispatches, ONE readback: dispatch overlaps device
            # work, so per-call time converges to max(device time, submit
            # cost) — an upper bound on on-device latency that excludes the
            # per-call relay RTT dominating serial p50 here (decomposition
            # validated against the profiler-trace device lane by
            # tools/serving_device_time.py).
            t0 = time.perf_counter()
            last = None
            for _ in range(pipeline_k):
                last = run(x)
            np.asarray(last[-1])
            out["pipelined_per_call_ms"] = (
                (time.perf_counter() - t0) * 1000 / pipeline_k)
        return out


def load_serving_state(config: Config, checkpoint_dir: str,
                       avg_ckpts: int = 0, use_ema: bool = False):
    """Restore ``(state, params, description)`` for serving — the single
    source of the checkpoint-selection policy shared by ``evaluate.py`` and
    ``tools/serving_map.py``: best checkpoint by default, the uniform
    average of the newest K with ``avg_ckpts`` (train/checkpoint.py
    ``average_checkpoints``), EMA params when requested (with a clear error
    on non-EMA checkpoints)."""
    from keras_object_detection_tpu.train.checkpoint import (
        CheckpointManager, average_checkpoints)
    from keras_object_detection_tpu.train.loop import create_train_state

    template = jax.device_get(
        create_train_state(config, jax.random.PRNGKey(0)))
    ckpt = CheckpointManager(checkpoint_dir)
    try:
        if avg_ckpts:
            state = average_checkpoints(ckpt, template, last_k=avg_ckpts)
            info = (f"average of the newest {avg_ckpts} checkpoints "
                    f"{ckpt.all_steps[-avg_ckpts:]}")
        else:
            state = ckpt.restore(template)
            info = (f"step={int(state.step)} (best={ckpt.best_step}, "
                    f"latest={ckpt.latest_step})")
    finally:
        ckpt.close()
    params = state.params
    if use_ema:
        if state.ema_params is None:
            raise ValueError("checkpoint has no EMA params "
                             "(train with TrainConfig.ema_decay)")
        params = state.ema_params
        info += ", EMA"
    return state, params, info


class Evaluator:
    """Dataset-level loss + mAP evaluation (ref train.py CustomCallback
    ``_calculate_map`` + post-fit test loop, without the 'It takes sometime')."""

    def __init__(self, config: Config, use_ema: bool = None, mesh=None):
        """``use_ema``: None = follow config (ema_decay + eval_with_ema);
        True/False = explicit override, e.g. the CLI ``--use-ema`` flag —
        keeps the dataset path consistent with the single-image
        ``InferenceModel`` path, which always obeys the flag.

        ``mesh``: optional ``jax.sharding.Mesh`` — batches land sharded over
        its data axis and the forward runs data-parallel across all chips
        (the in-training validation path already does this; this extends it
        to standalone evaluation). The batch size must divide by the data
        axis. ``None`` keeps the single-device path."""
        self.config = config
        self._eval_step = jax.jit(make_eval_step(config, use_ema=use_ema))
        self._batch_sharding = None
        self._replicated = None
        if mesh is not None:
            from keras_object_detection_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding)

            dp = mesh.shape[config.mesh.data_axis]
            if config.data.batch_size % dp:
                raise ValueError(
                    f"eval batch size {config.data.batch_size} must divide "
                    f"by the data-parallel mesh size {dp}")
            self._batch_sharding = batch_sharding(mesh, config.mesh.data_axis)
            self._replicated = replicated_sharding(mesh)
        self.map_metric = MeanAveragePrecision(
            config.grid.num_classes, config.grid.num_boxes, config.grid.grid,
            iou_threshold=config.eval.iou_threshold,
            conf_threshold=config.eval.conf_threshold,
            map_iou_threshold=config.eval.map_iou_threshold,
            anchors=(config.grid.anchors
                     if config.model.head in ("anchor", "fpn") else ()),
            fpn_scales=(config.model.fpn_scales
                        if config.model.head == "fpn" else 0),
            max_candidates=config.eval.max_candidates)

    def evaluate(self, state: TrainState, ds: YoloDataset,
                 with_map: bool = True,
                 coco_map: bool = False) -> Dict[str, float]:
        """``coco_map``: additionally sweep mAP over the COCO IoU thresholds
        0.50:0.05:0.95 (net-new vs the reference's single VOC mAP@0.5) —
        reuses the already-accumulated decode+NMS box sets, so the extra cost
        is one compiled matcher sweep, not another forward pass."""
        t0 = time.perf_counter()
        # Checkpoint-restored states are host numpy trees; without an
        # explicit device_put the jitted eval step re-uploads the full
        # weight set EVERY batch (~73 MB/s through the relay). No-op when
        # the state already lives on device (the in-training path). On a
        # mesh, parameters replicate across chips while batches shard over
        # the data axis (GSPMD partitions the forward from the shardings).
        state = jax.device_put(state, self._replicated)
        # shared masked-eval pass (single source of the padded-image
        # semantics; see train.loop.run_dataset_eval)
        loss, map_val = run_dataset_eval(
            self.config, self._eval_step, self.map_metric, state, ds,
            with_map=with_map or coco_map, sharding=self._batch_sharding)
        out = {"loss": loss}
        if with_map:
            out["mAP"] = map_val
        if coco_map:
            out.update(self.map_metric.result_multi())
        out["eval_time_s"] = time.perf_counter() - t0
        out["images_per_s"] = ds.num_examples / max(out["eval_time_s"], 1e-9)
        return out
