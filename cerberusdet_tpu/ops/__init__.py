from cerberusdet_tpu.ops.boxes import (  # noqa: F401
    bbox_iou,
    box_iou,
    bbox_ioa,
    wh_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xyxy2xywh,
    xywhn2xyxy,
    xyxy2xywhn,
)
from cerberusdet_tpu.ops.anchors import (  # noqa: F401
    bbox2dist,
    dist2bbox,
    dfl_expectation,
    make_anchors,
)
