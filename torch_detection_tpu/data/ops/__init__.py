from .bbox import (
    bbox_convert_mode,
    bbox_crop,
    bbox_denormalize,
    bbox_flip,
    bbox_normalize,
    bbox_pad,
    bbox_parse,
    bbox_resize,
    bbox_valid,
    bbox_visualize,
)
from .image import (
    img_aspect_ratio,
    img_aspect_ratio_flag,
    img_crop,
    img_denormalize,
    img_flip,
    img_normalize,
    img_pad,
    img_pad_size_divisor,
    img_read,
    img_resize,
    img_rotate,
    img_visualize,
    img_write,
    pad_shape_divisor,
    rescale_size,
)
from .mask import (
    mask_crop,
    mask_flip,
    mask_pad,
    mask_parse,
    mask_resize,
    mask_visualize,
    poly_to_mask,
    rle_decode,
    rle_encode,
    segm_to_mask,
)

__all__ = [k for k in dir() if not k.startswith("_")]
