"""keras_object_detection_tpu — a TPU-native object-detection framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the Keras YOLOv1
reference (myungsanglee/Keras-Object-Detection): YOLO-format data pipeline with
on-device augmentation and SxS grid-target encoding, config-table-driven
Darknet backbone plus VGG16/MobileNetV2-style variants, the four-term YOLOv1
loss with responsible-box IoU selection, batched on-device post-processing
(grid decode, class-aware NMS, VOC-style mAP@0.5), warmup / cosine-annealing
LR schedules, best-checkpoint training, fused forward+decode inference, and
int8 LiteRT export — all data-parallel over `jax.sharding.Mesh`.

Public surface (mirrors the reference's module roles; see SURVEY.md §1):

- ``core``      box geometry + grid encode/decode   (ref utils.py L0/L1)
- ``losses``    YOLOv1 multi-term loss              (ref loss.py)
- ``ops``       NMS, mAP, fused post-processing     (ref utils.py L1/L4)
- ``models``    backbones + detection heads         (ref model.py)
- ``data``      host reader + on-device pipeline    (ref dataset.py)
- ``train``     train loop, schedules, checkpoints  (ref train.py, cosine_annealing.py)
- ``parallel``  mesh / sharding utilities           (net-new, TPU-native)
- ``eval``      evaluator + latency harness         (ref evaluate.py, metric.py)
- ``export``    LiteRT / StableHLO export, int8 PTQ (ref convert_to_tflite.py)
- ``utils``     visualization and logging           (ref utils.py viz)
"""

__version__ = "0.1.0"

from keras_object_detection_tpu import config  # noqa: F401
