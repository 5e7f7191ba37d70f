"""Darknet-19 backbone tests (YOLOv2's backbone, arXiv:1612.08242 Table 6;
net-new — the reference repo is YOLOv1-only): table geometry, feature/tap
shapes, the full paper-faithful YOLOv2 assembly (darknet19 + anchor head +
passthrough + leaky_relu), and int8-serving plan coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.config import (
    Config, DataConfig, EvalConfig, GridConfig, ModelConfig, ScheduleConfig,
    TrainConfig,
)
from keras_object_detection_tpu.models.darknet import (
    DARKNET19_CONFIG, DarknetBackbone, _last_downsample_index,
)
from keras_object_detection_tpu.models.yolo import build_model

ANCHORS = ((0.1, 0.15), (0.4, 0.3), (0.8, 0.8))


def test_darknet19_table_geometry():
    convs = [e for e in DARKNET19_CONFIG if not isinstance(e, str)]
    pools = [e for e in DARKNET19_CONFIG if isinstance(e, str)]
    # 18 feature convs (the paper's 19th is its classifier 1x1, dropped
    # for detection), 5 pools -> stride 32
    assert len(convs) == 18
    assert len(pools) == 5
    # alternating 3x3 / 1x1 bottlenecks: every 1x1 has no padding
    assert all(e[3] == 0 for e in convs if e[0] == 1)
    assert all(e[3] == 1 for e in convs if e[0] == 3)
    # tap point = the last pool (features before it are the 512-ch 3x3
    # output — YOLOv2's passthrough source)
    tap_at = _last_downsample_index(DARKNET19_CONFIG)
    assert DARKNET19_CONFIG[tap_at] == "M"
    assert DARKNET19_CONFIG[tap_at - 1][1] == 512


def test_darknet19_shapes_and_tap():
    bb = DarknetBackbone(architecture=DARKNET19_CONFIG, return_tap=True,
                         activation="leaky_relu")
    x = jnp.zeros((1, 224, 224, 3))
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    (out, tap), _ = bb.apply(vars_, x, train=False, mutable=["batch_stats"])
    assert out.shape == (1, 7, 7, 1024)
    assert tap.shape == (1, 14, 14, 512)


def test_yolov2_paper_faithful_assembly():
    """darknet19 + anchor head + passthrough + leaky_relu — the full YOLOv2
    detection architecture — builds, runs, and emits the anchor layout."""
    cfg = Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3, anchors=ANCHORS),
        model=ModelConfig(backbone="darknet19", head="anchor", image_size=224,
                          compute_dtype="float32", activation="leaky_relu",
                          passthrough=True),
        data=DataConfig(batch_size=1, max_boxes_per_image=8),
        train=TrainConfig(optimizer="adam",
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
        eval=EvalConfig(conf_threshold=0.0),
    )
    model = build_model(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 224, 224, 3),
                       jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(vars_, imgs, train=False)
    assert out.shape == (1, 7, 7, len(ANCHORS) * (5 + 3))
    assert jnp.isfinite(out).all()


def test_darknet19_int8_plan():
    from keras_object_detection_tpu.export.int8_serving import conv_plan
    plan = conv_plan("darknet19")
    assert sum(1 for s in plan if s[0] == "conv") == 18
    assert sum(1 for s in plan if s[0] == "pool") == 5
