from keras_object_detection_tpu.train.schedules import (  # noqa: F401
    cosine_annealing_restarts_lrs,
    epoch_schedule,
    piecewise_warmup_lr,
)
from keras_object_detection_tpu.train.loop import (  # noqa: F401
    Trainer,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from keras_object_detection_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from keras_object_detection_tpu.train.metrics_logger import MetricLogger  # noqa: F401
