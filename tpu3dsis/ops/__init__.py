from tpu3dsis.ops.nms import nms_mask, nms_keep_indices
from tpu3dsis.ops.roi_pool3d import roi_pool3d, roi_pool3d_multilevel

__all__ = ["nms_mask", "nms_keep_indices", "roi_pool3d", "roi_pool3d_multilevel"]
