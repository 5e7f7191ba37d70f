from keras_object_detection_tpu.ops.nms import (  # noqa: F401
    batched_fast_non_max_suppression,
    batched_non_max_suppression,
    fast_non_max_suppression,
    non_max_suppression,
)
from keras_object_detection_tpu.ops.map import (  # noqa: F401
    COCO_IOU_THRESHOLDS,
    MeanAveragePrecision,
    average_precision_per_class,
    mean_average_precision,
    mean_average_precision_multi,
)
