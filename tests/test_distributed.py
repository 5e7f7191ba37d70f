"""Two-process ``jax.distributed`` end-to-end test (VERDICT round-2 item #7).

Spawns two real worker processes wired through a localhost coordinator via
``parallel.distributed.maybe_initialize`` — the actual DCN bootstrap path —
each loading its ``host_shard()`` file slice and assembling a global batch
with ``jax.make_array_from_process_local_data``. Asserts:

- both workers report distributed mode with 2 processes / 4 global devices;
- the strided file shards partition the dataset exactly;
- both workers read the SAME replicated global loss/checksums (the jit
  program spanned both processes);
- that loss matches a single-process run over the identical 8 images.

The reference has nothing here (single-GPU Keras); this is the framework's
own §2.2 multi-host bar.
"""

import json
import os
import shutil
import socket
import subprocess
import sys

import numpy as np
import pytest

FIXTURE = "/root/reference/yolo_v1/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


from distributed_worker import worker_config  # tests/ dir is on sys.path


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dist_data")
    for i in range(8):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"img{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"img{i}.txt")
    return str(d)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_parity(data_dir, tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"worker{i}.json") for i in range(2)]

    env = dict(os.environ)
    # fresh JAX in the children: CPU platform, and skip the axon relay
    # handshake (it can stall a CPU-only subprocess ~4 minutes)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "distributed_worker.py"),
             coordinator, "2", str(i), data_dir, outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out")
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n--- stdout\n{stdout}"
            f"\n--- stderr\n{stderr[-4000:]}")
        with open(outs[i]) as f:
            results.append(json.load(f))

    r0, r1 = results
    # both workers saw the full 2-process global batch
    assert r0["global_batch"] == r1["global_batch"] == 8
    # strided file sharding partitions the dataset exactly
    assert sorted(r0["local_paths"] + r1["local_paths"]) == [
        f"img{i}.jpg" for i in range(8)]
    assert not set(r0["local_paths"]) & set(r1["local_paths"])
    # the replicated outputs agree across processes (same jit program
    # executed by both over the shared global arrays)
    for k in ("loss", "pixel_sum", "box_sum", "encoded_obj"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6, err_msg=k)

    # single-process parity: same 8 images through the same eval step
    import jax

    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_eval_step)

    cfg = worker_config()
    ds = YoloDataset(data_dir, cfg.model.image_size, batch_size=8, max_boxes=8)
    imgs, boxes, valid = next(ds.epoch())
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    loss, _, _ = jax.jit(make_eval_step(cfg))(state, imgs, boxes, valid, None)
    np.testing.assert_allclose(r0["loss"], float(loss), rtol=1e-5)
    np.testing.assert_allclose(
        r0["pixel_sum"], float(np.asarray(imgs, np.float64).sum()), rtol=0)


def _spawn_pair(mode, data_dir, tmp_path, tag, ckpt_dir=None, timeout=420):
    """Launch a 2-process distributed_worker2 pair and return their JSONs."""
    coordinator = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"{tag}_worker{i}.json") for i in range(2)]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "distributed_worker2.py"),
             mode, coordinator, "2", str(i), data_dir, outs[i]]
            + ([ckpt_dir] if ckpt_dir else []),
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    results = []
    for i, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"{mode} worker {i} timed out")
        assert p.returncode == 0, (
            f"{mode} worker {i} rc={p.returncode}\n--- stdout\n{stdout}"
            f"\n--- stderr\n{stderr[-4000:]}")
        with open(outs[i]) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_process_fpn_train_step_parity(data_dir, tmp_path):
    """A YOLOv3-family (FPN head, anchors, ignore-mask, EMA) TRAIN step over
    the real 2-process jax.distributed mesh: both processes must read the
    same replicated loss and updated-state checksums, and the global loss
    must match a single-process step over the identical 8 images."""
    r0, r1 = _spawn_pair("fpn", data_dir, tmp_path, "fpn")
    assert r0["global_batch"] == r1["global_batch"] == 8
    assert r0["opt_step"] == r1["opt_step"] == 1
    for k in ("loss", "params_l1", "ema_l1"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6, err_msg=k)

    # single-process parity on the forward loss (gradient reduction order
    # differs across the process boundary -> loose DP-drift tolerance on
    # anything downstream of the update; the LOSS is pre-update and tight)
    import jax

    from distributed_worker2 import fpn_worker_config
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_train_step)

    cfg = fpn_worker_config()
    ds = YoloDataset(data_dir, cfg.model.image_size, batch_size=8,
                     max_boxes=8)
    imgs, boxes, valid = next(ds.epoch())
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    _, metrics = jax.jit(make_train_step(cfg))(
        state, imgs, boxes, valid, jax.random.PRNGKey(1))
    np.testing.assert_allclose(r0["loss"], float(metrics["total"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_two_process_ckpt_save_restore_resume(data_dir, tmp_path):
    """Orbax checkpoint lifecycle under jax.distributed: a 2-process pair
    trains 2 steps and saves (async orbax with multi-process coordination);
    a FRESH 2-process bootstrap restores it, verifies the optimizer step,
    params, EMA, and opt state survived bit-exactly, then trains one more
    step — the classic multi-host resume failure point (VERDICT r4 #6)."""
    ckpt_dir = str(tmp_path / "dist_ckpt")
    s0, s1 = _spawn_pair("ckpt_save", data_dir, tmp_path, "save",
                         ckpt_dir=ckpt_dir)
    for k in ("params_l1", "ema_l1", "opt_l1", "loss"):
        np.testing.assert_allclose(s0[k], s1[k], rtol=1e-6, err_msg=k)
    assert s0["opt_step"] == 2 and s0["saved_step"] == 7

    r0, r1 = _spawn_pair("ckpt_restore", data_dir, tmp_path, "restore",
                         ckpt_dir=ckpt_dir)
    for r in (r0, r1):
        assert r["restored_step"] == 7
        assert r["opt_step"] == 2, "optimizer step lost in restore"
        assert r["resumed_opt_step"] == 3, "resumed state not trainable"
        assert np.isfinite(r["resumed_loss"])
        # serialization round-trip is exact: restored checksums == saved
        for k in ("params_l1", "ema_l1", "opt_l1"):
            np.testing.assert_allclose(r[k], s0[k], rtol=1e-7, err_msg=k)
    np.testing.assert_allclose(r0["resumed_loss"], r1["resumed_loss"],
                               rtol=1e-6)
