#!/usr/bin/env python
"""Quick hardware sanity check on the attached TPU (uses the persistent
compile cache, so reruns take seconds):

  python tools/tpu_smoke.py

Checks: flagship train step executes + loss decreases over a few steps;
Pallas NMS matches the XLA implementation on-device; fused serving path runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from keras_object_detection_tpu.config import voc_full_config
    from keras_object_detection_tpu.eval.evaluator import InferenceModel
    from keras_object_detection_tpu.ops.nms import batched_non_max_suppression
    from keras_object_detection_tpu.ops.pallas_nms import (
        pallas_batched_non_max_suppression)
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

    print("devices:", jax.devices())

    cfg = voc_full_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=32))
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, size=(32, 448, 448, 3), dtype=np.uint8))
    boxes = np.zeros((32, 64, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.3, 0.3, 1.0]
    valid = np.zeros((32, 64), bool)
    valid[:, 0] = True
    boxes, valid = jnp.asarray(boxes), jnp.asarray(valid)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, images, boxes, valid, jax.random.PRNGKey(1))
    first = float(m["total"])
    print(f"train step 1: loss={first:.1f} ({time.time()-t0:.0f}s incl compile)")
    for _ in range(5):
        state, m = step(state, images, boxes, valid, jax.random.PRNGKey(1))
    last = float(m["total"])
    assert np.isfinite(last) and last < first, (first, last)
    print(f"train step 6: loss={last:.1f} (decreasing: OK)")

    infer = InferenceModel(cfg, state.params, state.batch_stats)
    dec = infer.predict_decoded(np.asarray(images[:8]))
    pb, pv = pallas_batched_non_max_suppression(dec)
    xb, xv = batched_non_max_suppression(dec)
    assert (np.asarray(pv) == np.asarray(xv)).all()
    for i in range(8):
        a = np.asarray(pb[i])[np.asarray(pv[i])]
        b = np.asarray(xb[i])[np.asarray(xv[i])]
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5)
    print("pallas NMS == XLA NMS on device: OK")

    kept = infer.predict_single(np.asarray(images[0]))
    print(f"fused serving path: {len(kept)} detections (untrained): OK")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
