"""Worker process for the two-process ``jax.distributed`` test
(``tests/test_distributed.py``) — exercises the REAL multi-host bootstrap
path end-to-end on a localhost coordinator (net-new vs the reference, which
has no distributed backend; SURVEY.md §2.2).

Invoked as::

    python tests/distributed_worker.py <coordinator> <num_procs> <proc_id> \
        <data_dir> <out_json>

Each worker: initializes ``jax.distributed`` through
``parallel.distributed.maybe_initialize``, loads ITS ``host_shard()`` slice
of the dataset (strided file sharding, ``YoloDataset(shard_index/count)``),
assembles the global batch with ``jax.make_array_from_process_local_data``
over a global 1D data mesh, runs the standard eval step jitted over that
mesh, and writes the (replicated) global loss + batch checksums to
``out_json`` for the parent to compare across workers and against a
single-process run.
"""

import json
import os
import sys


def worker_config():
    """Shared between the workers and the parent's in-process parity check:
    a micro model so the 2-process CPU compiles stay in seconds."""
    from keras_object_detection_tpu.config import (Config, DataConfig,
                                                   GridConfig, ModelConfig,
                                                   ScheduleConfig, TrainConfig)

    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=4, max_boxes_per_image=8),
        train=TrainConfig(epochs=1, optimizer="adam",
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3), seed=0),
    )


def main() -> None:
    coordinator, num_procs, proc_id, data_dir, out_json = sys.argv[1:6]

    # 2 local CPU devices per process -> 4 global devices across 2 workers.
    # XLA_FLAGS must be set before the CPU client exists; the platform switch
    # must go through jax.config (the sitecustomize may have imported jax).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from keras_object_detection_tpu.parallel import distributed

    active = distributed.maybe_initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs),
        process_id=int(proc_id),
    )
    assert active, "maybe_initialize did not report distributed mode"
    assert jax.process_count() == int(num_procs), jax.process_count()
    # idempotency: a second call must be a no-op that still reports active
    assert distributed.maybe_initialize() is True

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from keras_object_detection_tpu.data.pipeline import YoloDataset

    cfg = worker_config()
    shard_index, shard_count = distributed.host_shard()
    assert (shard_index, shard_count) == (int(proc_id), int(num_procs))

    ds = YoloDataset(
        data_dir, cfg.model.image_size, batch_size=4, max_boxes=8,
        shard_index=shard_index, shard_count=shard_count)
    imgs, boxes, valid = next(ds.epoch())  # this host's 4-image local batch

    # Global batch assembly: 1D data mesh over all 4 global devices; each
    # process contributes its local rows, JAX stitches the global array.
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    bsh = NamedSharding(mesh, P("data"))
    g_imgs = jax.make_array_from_process_local_data(bsh, imgs)
    g_boxes = jax.make_array_from_process_local_data(bsh, boxes)
    g_valid = jax.make_array_from_process_local_data(bsh, valid)
    assert g_imgs.shape[0] == imgs.shape[0] * int(num_procs)

    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_eval_step)

    # Same seed on every process -> identical replicated params.
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    eval_step = jax.jit(make_eval_step(cfg))
    loss, y_true, _ = eval_step(state, g_imgs, g_boxes, g_valid, None)

    # Replicated scalar: every process reads the same global mean loss.
    result = {
        "process": int(proc_id),
        "global_batch": int(g_imgs.shape[0]),
        "loss": float(loss),
        # permutation-invariant checksums of the ASSEMBLED global batch
        # (reduces are replicated outputs, so fully readable on every host)
        "pixel_sum": float(jax.jit(lambda x: x.astype("float64").sum())(g_imgs)),
        "box_sum": float(jax.jit(lambda x: x.sum())(g_boxes)),
        "encoded_obj": float(jax.jit(lambda y: y.sum())(y_true)),
        "local_paths": [os.path.basename(p) for p in ds.paths],
    }
    with open(out_json, "w") as f:
        json.dump(result, f)
    print("worker", proc_id, "ok", result["loss"])


if __name__ == "__main__":
    main()
