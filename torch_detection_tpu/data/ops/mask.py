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
    starts, ends = rle_intervals(rle)
    # paint the 1-runs with a difference array + cumsum (no per-run loop)
    diff = np.zeros(h * w + 1, dtype=np.int8)
    diff[starts] += 1
    diff[ends] -= 1
    flat = np.cumsum(diff[:-1]).astype(np.uint8)
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


def _rle_decompress_py(s: Union[bytes, str]) -> List[int]:
    """Scalar COCO LEB128-style decoder — the semantic oracle for the
    vectorized path below (tests compare them on random masks)."""
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


def _rle_compress_py(counts: Sequence[int]) -> bytes:
    """Scalar encoder oracle (see ``_rle_decompress_py``)."""
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


def _rle_decompress(s: Union[bytes, str]) -> np.ndarray:
    """COCO's LEB128-like RLE string -> run-length counts, vectorized.

    Per-byte python decoding is the bottleneck of streaming segm eval
    (~2k bytes/mask x 100 dets/img); this does the whole string in a
    handful of numpy passes: group the 5-bit chunks by their continuation
    bit, combine each group with shifted ors via ``add.reduceat``,
    sign-extend groups whose top chunk has bit 0x10, then undo the
    counts[i] += counts[i-2] delta with two strided cumsums.
    """
    if isinstance(s, str):
        s = s.encode("ascii")
    if not s:
        return np.zeros(0, np.int64)
    a = np.frombuffer(s, np.uint8).astype(np.int64) - 48
    bits = a & 0x1F
    more = (a & 0x20) != 0
    ends = np.nonzero(~more)[0]  # last byte of each value group
    starts = np.concatenate([np.zeros(1, np.int64), ends[:-1] + 1])
    group = np.searchsorted(ends, np.arange(len(a)), side="left")
    k = np.arange(len(a)) - starts[group]
    x = np.add.reduceat(bits << (5 * k), starts)
    neg = (bits[ends] & 0x10) != 0
    glen = ends - starts + 1
    x = np.where(neg, x + (-1 << (5 * glen)), x)
    # delta decode: counts[i] += counts[i-2] for i > 2 — two strided cumsums
    out = x.copy()
    out[1::2] = np.cumsum(x[1::2])
    out[2::2] = np.cumsum(x[2::2])
    return out


def _rle_compress(counts: Sequence[int]) -> bytes:
    """Vectorized inverse of ``_rle_decompress`` (same chunk format)."""
    x = np.asarray(counts, np.int64)
    if x.size == 0:
        return b""
    v = x.copy()
    v[3:] = x[3:] - x[1:-2]  # delta: counts[i] -= counts[i-2] for i > 2
    # chunks per value: magnitude bits + 1 sign bit, 5 bits per chunk
    w = np.where(v >= 0, v, ~v).astype(np.float64)
    nbits = np.where(w > 0, np.ceil(np.log2(w + 1.0)), 0).astype(np.int64) + 1
    k = np.maximum((nbits + 4) // 5, 1)
    offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(k)])
    idx = np.repeat(np.arange(len(v)), k)
    j = np.arange(offs[-1]) - offs[idx]
    chunk = (v[idx] >> (5 * j)) & 0x1F
    cont = np.where(j < k[idx] - 1, 0x20, 0)
    return ((chunk | cont) + 48).astype(np.uint8).tobytes()


def _rle_counts(rle: Dict) -> Sequence[int]:
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _rle_decompress(counts)
    return counts


def rle_intervals(rle: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """The 1-runs of an RLE as sorted disjoint ``[start, end)`` intervals in
    flat column-major pixel order — the exact working form for RLE-native
    area/IoU (no dense decode, the pycocotools trick re-done in numpy)."""
    counts = np.asarray(_rle_counts(rle), np.int64)
    bounds = np.concatenate([np.zeros(1, np.int64), np.cumsum(counts)])
    starts = bounds[1::2]
    ends = bounds[2::2]
    return starts[: len(ends)], ends


def rle_area(rle: Dict) -> int:
    """Foreground pixel count of an RLE, without decoding."""
    starts, ends = rle_intervals(rle)
    return int((ends - starts).sum())


def _interval_intersection(
    sa: np.ndarray, ea: np.ndarray, sb: np.ndarray, eb: np.ndarray
) -> int:
    """Total overlap between two sorted disjoint interval sets.

    Vectorized over the a-intervals: for each ``[sa, ea)`` the overlapping
    b-range is ``searchsorted``-bounded; because b-intervals are disjoint and
    sorted, only the FIRST and LAST overlapping b-interval can be clipped, so
    the interior contributes its exact cumulative length.
    """
    if len(sa) == 0 or len(sb) == 0:
        return 0
    i0 = np.searchsorted(eb, sa, side="right")
    i1 = np.searchsorted(sb, ea, side="left")
    cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(eb - sb)])
    base = cum[i1] - cum[i0]
    has = i1 > i0
    lo = np.maximum(0, sa - sb[np.minimum(i0, len(sb) - 1)])
    hi = np.maximum(0, eb[np.maximum(i1 - 1, 0)] - ea)
    return int((base - lo - hi)[has].sum())


def rle_iou_matrix(
    dt_rles: Sequence[Dict], gt_rles: Sequence[Dict], crowd: bool = False
) -> np.ndarray:
    """Pairwise mask IoU between two RLE lists, computed run-native.

    ``crowd=True`` uses the COCO iscrowd rule: intersection / dt area.
    Exactly equals ``eval.mask_iou_matrix`` on the decoded masks
    (tests/test_segm_eval.py has the oracle) at O(runs) instead of O(pixels)
    per pair — the memory/time fix for full-val-set segm evaluation.
    """
    d_ints = [rle_intervals(r) for r in dt_rles]
    g_ints = [rle_intervals(r) for r in gt_rles]
    d_areas = np.array([float((e - s).sum()) for s, e in d_ints])
    g_areas = np.array([float((e - s).sum()) for s, e in g_ints])
    iou = np.zeros((len(dt_rles), len(gt_rles)))
    for i, (sa, ea) in enumerate(d_ints):
        for j, (sb, eb) in enumerate(g_ints):
            inter = _interval_intersection(sa, ea, sb, eb)
            denom = d_areas[i] if crowd else d_areas[i] + g_areas[j] - inter
            iou[i, j] = inter / max(denom, 1e-9)
    return iou


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
