"""End-to-end convergence proof: overfit the reference's real fixture image
until the decoded detections recover the ground truth (mAP -> 1.0).

This exercises the full production path — native/cv2 JPEG decode, grid
encoding, darknet backbone + conv head, the four-term loss, optimizer,
decode + NMS + mAP — and pins down a real behavioral fact: with the
reference-parity loss (noobj only on the selected slot, ref loss.py:197) the
never-trained second slot caps attainable mAP, while the paper-faithful
``noobj_mode="all"`` drives mAP to ~1.0. The reference's own logged training
results (mAP <= 0.014, ref train_info.txt) are consistent with this.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keras_object_detection_tpu.config import Config, GridConfig, ModelConfig
from keras_object_detection_tpu.core.grid import encode_grid
from keras_object_detection_tpu.data.reader import load_example
from keras_object_detection_tpu.losses.yolo import yolo_v1_loss
from keras_object_detection_tpu.models.yolo import build_model
from keras_object_detection_tpu.ops.map import MeanAveragePrecision

JPG = "/root/reference/yolo_v1/data/test.jpg"


@pytest.mark.slow
def test_overfit_fixture_to_full_map():
    cfg = Config(
        grid=GridConfig(num_classes=3),
        model=ModelConfig(backbone="darknet_tiny", head="conv",
                          image_size=224, compute_dtype="float32"))
    img, boxes, valid = load_example(JPG, 224, 8)
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0
    y = encode_grid(jnp.asarray(boxes), jnp.asarray(valid), 3)[None]

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, bstats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True,
                mutable=["batch_stats"])
            return yolo_v1_loss(y, out, 3, noobj_mode="all"), upd["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, u), bs, opt2, l

    first = None
    for i in range(800):
        params, bstats, opt, loss = step(params, bstats, opt)
        if first is None:
            first = float(loss)
    # Adam oscillates near the floor; two orders of magnitude down is
    # convergence — the decisive check is the mAP below.
    assert float(loss) < first / 50, f"no convergence: {first} -> {float(loss)}"

    out = model.apply({"params": params, "batch_stats": bstats}, x, train=False)
    metric = MeanAveragePrecision(3)
    metric.update_state(y, out)
    assert metric.result() > 0.95
