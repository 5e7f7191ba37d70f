from keras_object_detection_tpu.data.reader import (  # noqa: F401
    list_examples,
    load_example,
    read_yolo_labels,
)
from keras_object_detection_tpu.data.augment import (  # noqa: F401
    augment_batch,
    preprocess_eval_batch,
)
from keras_object_detection_tpu.data.pipeline import YoloDataset  # noqa: F401
