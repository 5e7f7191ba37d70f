from keras_object_detection_tpu.ops.nms import (  # noqa: F401
    batched_non_max_suppression,
    non_max_suppression,
)
from keras_object_detection_tpu.ops.map import (  # noqa: F401
    MeanAveragePrecision,
    mean_average_precision,
)
