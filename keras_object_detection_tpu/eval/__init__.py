from keras_object_detection_tpu.eval.evaluator import (  # noqa: F401
    Evaluator,
    InferenceModel,
)
