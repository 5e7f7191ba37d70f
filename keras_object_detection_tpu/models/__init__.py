from keras_object_detection_tpu.models.yolo import (  # noqa: F401
    YoloV1,
    build_model,
)
from keras_object_detection_tpu.models.darknet import (  # noqa: F401
    ARCHITECTURE_CONFIG,
    DARKNET_TINY_CONFIG,
    DarknetBackbone,
)
from keras_object_detection_tpu.models.backbones import (  # noqa: F401
    BACKBONES,
    MobileNetV2Backbone,
    VGG16Backbone,
)
