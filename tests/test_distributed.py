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
