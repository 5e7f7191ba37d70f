from keras_object_detection_tpu.export.int8_serving import (  # noqa: F401
    Int8InferenceModel,
    calibrate_activation_scales,
    select_serving_model,
)
from keras_object_detection_tpu.export.litert import (  # noqa: F401
    export_stablehlo,
    export_tflite,
)
