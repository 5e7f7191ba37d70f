from keras_object_detection_tpu.core.anchors import (  # noqa: F401
    decode_anchor_grid,
    decode_anchor_targets,
    encode_anchor_grid,
)
from keras_object_detection_tpu.core.boxes import (  # noqa: F401
    cxcywh_to_corners,
    iou_cxcywh,
    iou_cxcywh_exact,
    pairwise_iou_cxcywh,
    pairwise_iou_cxcywh_exact,
)
from keras_object_detection_tpu.core.fpn import (  # noqa: F401
    decode_fpn_grids,
    decode_fpn_targets,
    encode_fpn_grids,
    fpn_grid_sizes,
    partition_anchors,
)
from keras_object_detection_tpu.core.grid import (  # noqa: F401
    decode_grid,
    encode_grid,
)
