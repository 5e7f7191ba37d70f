from keras_object_detection_tpu.losses.yolo import (  # noqa: F401
    YoloV1Loss,
    yolo_v1_loss,
    yolo_v1_loss_terms,
)
