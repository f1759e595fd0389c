"""Host-side mask ops (numpy/cv2), pycocotools-free.

The reference (``datasets/utils/mask.py``) delegates polygon->binary-mask to
``pycocotools`` ``annToMask`` (``mask.py:35``); that library is not available
here, so this module carries a native COCO segmentation decoder:

* polygon rasterization via ``cv2.fillPoly`` (matches pycocotools' frPyObjects
  fill semantics for detection-use purposes),
* uncompressed RLE ({'counts': [int...], 'size': [h, w]}, column-major), and
* compressed RLE (the LEB128-style byte string used in COCO json) decode +
  encode.

Geometry ops (resize/flip/crop/pad) mirror reference ``mask.py:90-192``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from .image import img_crop, img_pad, img_resize


# ---------------------------------------------------------------- RLE codec
def rle_decode(rle: Dict) -> np.ndarray:
    """Decode a COCO RLE dict (compressed or uncompressed) to a HxW uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _rle_decompress(counts)
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    # COCO RLE is column-major (Fortran order)
    return flat.reshape((w, h)).T


def rle_encode(mask: np.ndarray, compress: bool = True) -> Dict:
    """Encode a HxW binary mask to COCO RLE (column-major run lengths)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1)
    # run-length: counts alternate zeros/ones starting with zeros
    counts: List[int] = []
    if flat.size == 0:
        counts = [0]
    else:
        changes = np.nonzero(np.diff(flat))[0] + 1
        boundaries = np.concatenate([[0], changes, [flat.size]])
        runs = np.diff(boundaries).tolist()
        if flat[0] == 1:
            counts = [0] + runs
        else:
            counts = runs
    if compress:
        return {"size": [h, w], "counts": _rle_compress(counts)}
    return {"size": [h, w], "counts": counts}


def _rle_decompress(s: Union[bytes, str]) -> List[int]:
    """COCO's LEB128-like variable-length RLE string -> run-length counts."""
    if isinstance(s, str):
        s = s.encode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def _rle_compress(counts: Sequence[int]) -> bytes:
    out = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


# ---------------------------------------------------------------- parsing
def poly_to_mask(polygons: Sequence[Sequence[float]], height: int, width: int) -> np.ndarray:
    """Rasterize COCO polygons ([x0,y0,x1,y1,...] lists) to a binary mask."""
    mask = np.zeros((height, width), dtype=np.uint8)
    pts = [np.asarray(p, dtype=np.float64).reshape(-1, 2).round().astype(np.int32) for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def segm_to_mask(segmentation, height: int, width: int) -> np.ndarray:
    """COCO 'segmentation' field (polygons or RLE) -> HxW uint8 mask."""
    if isinstance(segmentation, list):
        return poly_to_mask(segmentation, height, width)
    if isinstance(segmentation, dict):
        return rle_decode(segmentation)
    raise TypeError(f"unsupported segmentation type {type(segmentation)}")


def mask_parse(
    annotation: Dict,
    gt_masks: List,
    gt_mask_polys: List,
    gt_poly_lens: List,
    img_height: int,
    img_width: int,
) -> None:
    """Append an annotation's mask + valid polygons to the accumulators.

    Same contract as reference ``mask.py:9-41`` but decodes natively instead of
    via ``dataset.annToMask`` (pycocotools), so it takes the image size rather
    than a COCO object.
    """
    gt_masks.append(segm_to_mask(annotation["segmentation"], img_height, img_width))
    segm = annotation["segmentation"]
    if isinstance(segm, list):
        mask_polys = [p for p in segm if len(p) >= 6]
    else:
        mask_polys = []
    gt_mask_polys.append(mask_polys)
    gt_poly_lens.extend(len(p) for p in mask_polys)


# ---------------------------------------------------------------- visualize
def mask_visualize(
    img_array: np.ndarray,
    masks: np.ndarray,
    inds: np.ndarray,
    mask_color=(0, 255, 0),
    alpha: float = 0.5,
    show: bool = False,
    win_name: str = "",
    wait_time: int = 0,
    out_file: Optional[str] = None,
) -> np.ndarray:
    """Overlay mask contours with opacity ``alpha``; returns the blended image."""
    from .image import img_visualize, img_write

    assert masks.ndim == 3
    masks = masks.astype(np.uint8)
    output_img = img_array.copy()
    if inds is not None and len(inds) > 0:
        masks = masks[inds, ...]
    overlay = img_array.copy()
    for mask in masks:
        contours, _ = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
        cv2.fillPoly(overlay, pts=contours, color=mask_color)
    cv2.addWeighted(src1=overlay, alpha=alpha, src2=output_img, beta=1 - alpha, gamma=0, dst=output_img)
    if show:  # pragma: no cover - interactive
        img_visualize(output_img, win_name, wait_time)
    if out_file is not None:
        img_write(output_img, out_file)
    return output_img


# ---------------------------------------------------------------- geometry
def mask_resize(mask: np.ndarray, scale_factor=None, return_scale: bool = False, interpolation: str = "nearest"):
    assert mask.ndim == 2
    return img_resize(
        mask.astype(np.uint8),
        scale_factor=scale_factor,
        return_scale=return_scale,
        interpolation=interpolation,
    )


def mask_flip(mask: np.ndarray, flipped_flag: bool = True, direction: str = "horizontal") -> np.ndarray:
    assert mask.ndim == 2
    mask = mask.astype(np.uint8)
    if not flipped_flag:
        return mask
    axis = 1 if direction == "horizontal" else 0
    return np.flip(mask, axis)


def mask_crop(mask: np.ndarray, size_crop: Tuple[int, int], min_w: int = 0, min_h: int = 0) -> np.ndarray:
    assert mask.ndim == 2
    return img_crop(mask.astype(np.uint8), size_crop, min_w=min_w, min_h=min_h)


def mask_pad(mask: np.ndarray, expected_shape: Tuple[int, int], pad_val=0) -> np.ndarray:
    assert mask.ndim == 2
    return img_pad(mask.astype(np.uint8), expected_shape, pad_val=pad_val)
