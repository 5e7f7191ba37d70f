from keras_object_detection_tpu.losses.yolo import (  # noqa: F401
    YoloV1Loss,
    yolo_v1_loss,
    yolo_v1_loss_terms,
)
from keras_object_detection_tpu.losses.yolov2 import (  # noqa: F401
    yolo_v2_loss_terms,
)
from keras_object_detection_tpu.losses.yolov3 import (  # noqa: F401
    yolo_v3_loss_terms,
)
