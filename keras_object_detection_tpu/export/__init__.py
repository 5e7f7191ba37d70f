from keras_object_detection_tpu.export.litert import (  # noqa: F401
    export_stablehlo,
    export_tflite,
)
