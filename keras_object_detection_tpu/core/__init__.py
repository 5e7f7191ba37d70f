from keras_object_detection_tpu.core.boxes import (  # noqa: F401
    cxcywh_to_corners,
    iou_cxcywh,
    pairwise_iou_cxcywh,
)
from keras_object_detection_tpu.core.grid import (  # noqa: F401
    decode_grid,
    encode_grid,
)
