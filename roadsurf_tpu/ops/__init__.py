from .roi_align import roi_align_multilevel
from .nms import batched_nms_fixed, nms_fixed

__all__ = ["roi_align_multilevel", "nms_fixed", "batched_nms_fixed"]
