from tpu3dsis.geometry.boxes import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlap,
    nms_overlap,
)
from tpu3dsis.geometry.anchors import (
    read_anchor_sizes,
    tile_anchors,
    generate_level_anchors,
    anchors_inside_mask,
)

__all__ = [
    "bbox_transform",
    "bbox_transform_inv",
    "clip_boxes",
    "bbox_overlap",
    "nms_overlap",
    "read_anchor_sizes",
    "tile_anchors",
    "generate_level_anchors",
    "anchors_inside_mask",
]
