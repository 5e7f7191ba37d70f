from keras_object_detection_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
)
