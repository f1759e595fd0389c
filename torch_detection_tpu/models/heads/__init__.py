from .anchor_head import RetinaHead, flatten_head_outputs

__all__ = ["RetinaHead", "flatten_head_outputs"]
