from .config import ModelConfig, fast_profile, from_detectron2_yaml
from .mask_rcnn import forward_inference, init_params, make_inference_fn

__all__ = [
    "ModelConfig", "fast_profile", "from_detectron2_yaml",
    "init_params", "forward_inference", "make_inference_fn",
]
