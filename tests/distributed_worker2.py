"""Round-5 distributed workers (``tests/test_distributed.py``): beyond the
round-3 v1 eval-step parity, exercise (a) an FPN-family TRAIN step and (b)
orbax checkpoint save -> restart -> resume, both under a REAL 2-process
``jax.distributed`` localhost coordinator (VERDICT r4 weak #6 — orbax
process coordination is the classic multi-host failure point).

Invoked as::

    python tests/distributed_worker2.py <mode> <coordinator> <num_procs> \
        <proc_id> <data_dir> <out_json> [<ckpt_dir>]

Modes:
  fpn          one jitted YOLOv3-family train step over the global 2-process
               data mesh; reports the (replicated) loss + param checksums.
  ckpt_save    two train steps, then ``CheckpointManager.save`` (orbax async
               + multi-process coordination); reports state checksums.
  ckpt_restore fresh bootstrap, ``restore`` into a template, verify the
               optimizer step / params / EMA survived, then train one MORE
               step to prove the resumed state is live.
"""

import json
import os
import sys


def fpn_worker_config():
    """Micro YOLOv3-family config (darknet_micro, 2 scales, 6 anchors at 56²)
    shared by workers and the parent's single-process parity check."""
    from keras_object_detection_tpu.config import (Config, DataConfig,
                                                   GridConfig, ModelConfig,
                                                   ScheduleConfig, TrainConfig)

    anchors = ((0.08, 0.06), (0.1, 0.16), (0.2, 0.2),
               (0.3, 0.5), (0.5, 0.3), (0.8, 0.75))
    return Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3, anchors=anchors),
        model=ModelConfig(backbone="darknet_micro", head="fpn", fpn_scales=2,
                          image_size=56, compute_dtype="float32",
                          activation="leaky_relu"),
        data=DataConfig(batch_size=4, max_boxes_per_image=8),
        train=TrainConfig(epochs=1, optimizer="adam", ignore_threshold=0.5,
                          obj_target="iou", ema_decay=0.999,
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3), seed=0),
    )


def _tree_l1(tree) -> float:
    import jax
    import jax.numpy as jnp

    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            tot += float(jnp.abs(leaf).sum())
    return tot


def main() -> None:
    mode, coordinator, num_procs, proc_id, data_dir, out_json = sys.argv[1:7]
    ckpt_dir = sys.argv[7] if len(sys.argv) > 7 else None

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from keras_object_detection_tpu.parallel import distributed

    assert distributed.maybe_initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs), process_id=int(proc_id))
    assert jax.process_count() == int(num_procs)

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_train_step)

    cfg = fpn_worker_config()
    shard_index, shard_count = distributed.host_shard()
    ds = YoloDataset(data_dir, cfg.model.image_size, batch_size=4,
                     max_boxes=8, shard_index=shard_index,
                     shard_count=shard_count)
    imgs, boxes, valid = next(ds.epoch())

    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    bsh = NamedSharding(mesh, P("data"))
    g_imgs = jax.make_array_from_process_local_data(bsh, imgs)
    g_boxes = jax.make_array_from_process_local_data(bsh, boxes)
    g_valid = jax.make_array_from_process_local_data(bsh, valid)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)

    result = {"process": int(proc_id), "global_batch": int(g_imgs.shape[0])}

    if mode == "fpn":
        state, metrics = step_fn(state, g_imgs, g_boxes, g_valid, rng)
        result.update(
            loss=float(metrics["total"]),
            params_l1=_tree_l1(state.params),
            ema_l1=_tree_l1(state.ema_params),
            opt_step=int(state.step),
        )
    elif mode == "ckpt_save":
        from keras_object_detection_tpu.train.checkpoint import (
            CheckpointManager)

        for _ in range(2):
            state, metrics = step_fn(state, g_imgs, g_boxes, g_valid, rng)
        mgr = CheckpointManager(ckpt_dir)
        mgr.save(7, jax.device_get(state), {"val_loss": 1.25})
        mgr.wait()
        mgr.close()
        result.update(
            loss=float(metrics["total"]),
            params_l1=_tree_l1(state.params),
            ema_l1=_tree_l1(state.ema_params),
            opt_l1=_tree_l1(state.opt_state),
            opt_step=int(state.step),
            saved_step=7,
        )
    elif mode == "ckpt_restore":
        from keras_object_detection_tpu.train.checkpoint import (
            CheckpointManager)

        mgr = CheckpointManager(ckpt_dir)
        template = jax.device_get(create_train_state(cfg,
                                                     jax.random.PRNGKey(3)))
        state = mgr.restore(template, step=mgr.latest_step)
        restored = {
            "restored_step": int(mgr.latest_step),
            "opt_step": int(state.step),
            "params_l1": _tree_l1(state.params),
            "ema_l1": _tree_l1(state.ema_params),
            "opt_l1": _tree_l1(state.opt_state),
        }
        # resumed state must be LIVE: one more global train step
        state, metrics = step_fn(state, g_imgs, g_boxes, g_valid, rng)
        restored["resumed_loss"] = float(metrics["total"])
        restored["resumed_opt_step"] = int(state.step)
        mgr.close()
        result.update(restored)
    else:
        raise SystemExit(f"unknown mode {mode}")

    with open(out_json, "w") as f:
        json.dump(result, f)
    print("worker", proc_id, mode, "ok")


if __name__ == "__main__":
    main()
