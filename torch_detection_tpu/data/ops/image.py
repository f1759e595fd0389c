"""Host-side image ops (numpy/cv2).

These are the correctness oracle for the fused on-device preprocessing kernel
(``torch_detection_tpu.ops.preprocess``).  Math semantics match the reference
``datasets/utils/image.py`` (TCGGroup/Torch_Detection):

* keep-ratio resize scale = min(short_cap/short_edge, long_cap/long_edge)
  (reference ``image.py:185``);
* pad-to-divisor ceil rule (reference ``image.py:326-347``);
* flip returns (img, flipped_flag, direction) (reference ``image.py:220-249``).

Deliberate differences: randomness comes from an injected ``np.random
.Generator`` (determinism across hosts is a framework requirement, SURVEY.md
§5), images can be returned in float32 directly, and the crop assert bug at
reference ``image.py:370`` (``>=`` vs ``&`` precedence) is not replicated.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Sequence, Tuple, Union

import cv2
import numpy as np

from ...utils.misc import exist_or_mkdir, file_is_exist, is_str

INTERP_CODES = {
    "nearest": cv2.INTER_NEAREST,
    "bilinear": cv2.INTER_LINEAR,
    "bicubic": cv2.INTER_CUBIC,
    "area": cv2.INTER_AREA,
    "lanczos": cv2.INTER_LANCZOS4,
}


# ---------------------------------------------------------------- io
def img_read(img_path: str, img_mode: str = "rgb") -> np.ndarray:
    """Read an image (HWC uint8) with cv2; convert BGR->RGB unless asked not to."""
    assert is_str(img_path), "image path must be a string"
    if not file_is_exist(img_path):
        raise FileNotFoundError(f"{img_path} does not exist")
    assert img_mode in ("rgb", "bgr")
    img = cv2.imread(img_path)
    if img is None:
        raise IOError(f"cv2 failed to decode {img_path}")
    if img_mode == "rgb":
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img


def img_write(img: np.ndarray, file_path: str, auto_mkdir: bool = True, img_mode: str = "rgb") -> None:
    """Write HWC image; ``img_mode`` names the channel order of ``img``
    (cv2 encodes BGR, so RGB input is converted first)."""
    assert img_mode in ("rgb", "bgr")
    if auto_mkdir:
        exist_or_mkdir(osp.dirname(osp.abspath(file_path)))
    if img_mode == "rgb":
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    ok = cv2.imwrite(file_path, img)
    assert ok, f"cv2.imwrite failed for shape {img.shape} at {file_path}"


def img_visualize(img_array: np.ndarray, win_name: str = "", wait_time: int = 0, single_img: bool = True) -> None:
    """Interactive display (debug affordance; mirrors reference image.py:65-81)."""
    cv2.imshow(win_name, img_array)
    cv2.waitKey(wait_time)
    if single_img:
        cv2.destroyWindow(win_name)


# ---------------------------------------------------------------- normalize
def img_normalize(img: np.ndarray, img_mean, img_std, img_mode: str = "rgb") -> np.ndarray:
    assert img_mode in ("rgb", "bgr")
    mean = np.asarray(img_mean, dtype=np.float64)
    std = np.asarray(img_std, dtype=np.float64)
    return ((img - mean) / std).astype(np.float32)


def img_denormalize(img: np.ndarray, img_mean, img_std, img_mode: str = "rgb") -> np.ndarray:
    assert img_mode in ("rgb", "bgr")
    mean = np.asarray(img_mean, dtype=np.float64)
    std = np.asarray(img_std, dtype=np.float64)
    return np.asarray(img * std + mean)


# ---------------------------------------------------------------- resize
def rescale_size(old_size: Tuple[int, int], scale) -> Tuple[Tuple[int, int], float]:
    """Compute the (h, w) after keep-ratio rescale and the scale factor.

    ``scale`` can be an int (short-edge target), a (long, short) tuple
    (cap both edges, reference rule image.py:185), or a float factor.
    """
    h, w = old_size
    if isinstance(scale, (float, np.floating)):
        scale_factor = float(scale)
    elif isinstance(scale, (int, np.integer)):
        scale_factor = scale / min(h, w)
    elif isinstance(scale, tuple):
        scale_factor = min(min(scale) / min(h, w), max(scale) / max(h, w))
    else:
        raise TypeError(f"scale must be float/int/tuple, got {type(scale)}")
    new_h = int(np.round(h * scale_factor))
    new_w = int(np.round(w * scale_factor))
    return (new_h, new_w), scale_factor


def img_resize(
    img: np.ndarray,
    size=None,
    scale_factor=None,
    return_scale: bool = False,
    interpolation: str = "bilinear",
    rng: Optional[np.random.Generator] = None,
):
    """Resize by target ``size`` (int short-edge or (long, short) caps) or by
    ``scale_factor`` (float, or a sequence to sample from via ``rng``)."""
    if (size is None) == (scale_factor is None):
        raise ValueError("exactly one of size / scale_factor must be given")
    assert interpolation in INTERP_CODES, f"unknown interpolation {interpolation}"
    h, w = img.shape[:2]

    if size is not None:
        if not return_scale:
            raise ValueError("must return scale_factor when resizing by size")
        (new_h, new_w), sf = rescale_size((h, w), size)
    else:
        if isinstance(scale_factor, (tuple, list)):
            rand = rng if rng is not None else np.random.default_rng()
            scale_factor = float(rand.choice(scale_factor))
        (new_h, new_w), sf = rescale_size((h, w), float(scale_factor))

    resized = cv2.resize(img, (new_w, new_h), interpolation=INTERP_CODES[interpolation])
    if return_scale:
        return resized, sf
    return resized


# ---------------------------------------------------------------- flip
def img_flip(
    img: np.ndarray,
    flip_prob: float = 0.0,
    direction: str = "horizontal",
    rng: Optional[np.random.Generator] = None,
):
    """Randomly flip; returns (img, flipped_flag, direction)."""
    assert direction in ("horizontal", "vertical")
    assert 0.0 <= flip_prob <= 1.0
    rand = rng if rng is not None else np.random.default_rng()
    flipped = flip_prob > 0 and float(rand.random()) < flip_prob
    if flipped:
        axis = 1 if direction == "horizontal" else 0
        img = np.flip(img, axis)
    return img, flipped, direction


# ---------------------------------------------------------------- rotate
def img_rotate(
    img: np.ndarray,
    angle: float,
    center: Optional[Tuple[float, float]] = None,
    scale: float = 1.0,
    border_value=0,
    auto_bound: bool = False,
) -> np.ndarray:
    """Rotate clockwise by ``angle`` degrees about ``center`` (default image
    center); ``auto_bound`` grows the canvas to contain the rotated image."""
    if center is not None and auto_bound:
        raise ValueError("auto_bound conflicts with an explicit center")
    h, w = img.shape[:2]
    if center is None:
        center = ((w - 1) * 0.5, (h - 1) * 0.5)
    matrix = cv2.getRotationMatrix2D(center, -angle, scale)
    if auto_bound:
        cos = np.abs(matrix[0, 0])
        sin = np.abs(matrix[0, 1])
        new_w = h * sin + w * cos
        new_h = h * cos + w * sin
        matrix[0, 2] += (new_w - w) * 0.5
        matrix[1, 2] += (new_h - h) * 0.5
        w = int(np.round(new_w))
        h = int(np.round(new_h))
    return cv2.warpAffine(img, matrix, (w, h), borderValue=border_value)


# ---------------------------------------------------------------- pad
def img_pad(img: np.ndarray, expected_shape: Tuple[int, ...], pad_val=0) -> np.ndarray:
    """Pad bottom/right to ``expected_shape`` (H, W[, C]) with ``pad_val``."""
    if not isinstance(pad_val, (int, float)):
        assert len(pad_val) == img.shape[-1]
    if len(expected_shape) < img.ndim:
        expected_shape = tuple(expected_shape) + (img.shape[-1],)
    assert len(expected_shape) == img.ndim
    assert all(e >= s for e, s in zip(expected_shape, img.shape))
    padded = np.empty(expected_shape, dtype=img.dtype)
    padded[...] = pad_val
    padded[: img.shape[0], : img.shape[1], ...] = img
    return padded


def img_pad_size_divisor(img: np.ndarray, size_divisor: int, pad_val=0) -> np.ndarray:
    """Pad so H and W are multiples of ``size_divisor`` (FPN stride alignment;
    on TPU this also keeps spatial dims friendly to XLA tiling)."""
    assert isinstance(size_divisor, int) and size_divisor >= 1
    h, w = img.shape[:2]
    ph = int(np.ceil(h / size_divisor) * size_divisor)
    pw = int(np.ceil(w / size_divisor) * size_divisor)
    return img_pad(img, (ph, pw), pad_val=pad_val)


def pad_shape_divisor(shape: Tuple[int, int], size_divisor: int) -> Tuple[int, int]:
    h, w = shape
    return (
        int(np.ceil(h / size_divisor) * size_divisor),
        int(np.ceil(w / size_divisor) * size_divisor),
    )


# ---------------------------------------------------------------- crop
def img_crop(img: np.ndarray, size_crop: Tuple[int, int], min_w: int = 0, min_h: int = 0) -> np.ndarray:
    """Crop a (width, height) = ``size_crop`` window anchored at (min_w, min_h)."""
    assert isinstance(size_crop, tuple) and len(size_crop) == 2
    assert min_w >= 0 and min_h >= 0
    cw, ch = size_crop
    max_w = min_w + cw - 1
    max_h = min_h + ch - 1
    h, w = img.shape[:2]
    assert max_h <= h and max_w <= w, "crop window exceeds image bounds"
    return img[min_h : max_h + 1, min_w : max_w + 1, ...]


# ---------------------------------------------------------------- aspect ratio
def img_aspect_ratio(width: Union[int, float], height: Union[int, float]) -> float:
    return width / float(height)


def img_aspect_ratio_flag(width: Union[int, float], height: Union[int, float]) -> int:
    """1 for landscape (w/h > 1) else 0 — the grouping key for batch samplers."""
    return int(img_aspect_ratio(width, height) > 1)
