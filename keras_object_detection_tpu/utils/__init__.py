from keras_object_detection_tpu.utils.viz import (  # noqa: F401
    get_grid_tagged_img,
    get_tagged_img,
)
