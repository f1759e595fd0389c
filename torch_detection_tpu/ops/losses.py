"""Detection losses (pure jnp, mask-weighted, fixed shapes).

The reference has no loss tier (SURVEY.md §2 #33 [ABSENT]); the only hook is
``bias_init_with_prob`` (reference ``models/utils/inits.py:49-52``) which
implies focal-loss heads.  This module supplies the standard detection set:
sigmoid focal loss, smooth L1, (binary) cross-entropy, IoU/GIoU.

Convention: every loss takes an elementwise ``weight`` and an ``avg_factor``;
reductions are explicit sums over masked elements so batches stay
fixed-shape (padding rows get weight 0).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray], avg_factor: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    total = jnp.sum(loss)
    if avg_factor is None:
        return total
    return total / jnp.maximum(avg_factor, 1.0)


def sigmoid_focal_loss(
    logits: jnp.ndarray,  # (..., C)
    targets: jnp.ndarray,  # (..., C) one-hot {0,1}
    weight: Optional[jnp.ndarray] = None,  # broadcastable to logits
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """RetinaNet focal loss: FL(p_t) = -alpha_t (1 - p_t)^gamma log(p_t)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    loss = alpha_t * (1 - p_t) ** gamma * ce
    return _reduce(loss, weight, avg_factor)


def optax_sigmoid_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _focal_elem_f32(x: jnp.ndarray, t: jnp.ndarray, gamma: float, alpha: float) -> jnp.ndarray:
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    return alpha_t * (1 - p_t) ** gamma * ce


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _focal_sparse_elem(
    logits: jnp.ndarray,  # (..., C) any float dtype
    label0: jnp.ndarray,  # (...,) int32 0-based fg class, -1 = all-negative row
    gamma: float,
    alpha: float,
) -> jnp.ndarray:
    """Elementwise focal loss with the one-hot target built in-kernel.

    The dense formulation's AD saves several (N, C) f32 residuals (p, ce,
    p_t) plus the materialized one-hot — ~2 GB of HBM round-trips per
    RetinaNet train step at COCO scale.  Here both passes are a single
    fused elementwise kernel over the (bf16) logits with the target
    recomputed from the integer label, and the backward is the analytic
    derivative — residuals are just (logits, label0)."""
    t = (label0[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, logits.ndim - 1)).astype(jnp.float32)
    return _focal_elem_f32(logits.astype(jnp.float32), t, gamma, alpha)


def _focal_sparse_fwd(logits, label0, gamma, alpha):
    return _focal_sparse_elem(logits, label0, gamma, alpha), (logits, label0)


def _focal_sparse_bwd(gamma, alpha, res, g):
    logits, label0 = res
    x = logits.astype(jnp.float32)
    t = (label0[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, logits.ndim - 1)).astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    alpha_t = alpha * t + (1 - alpha) * (1 - t)
    one_m = 1 - p_t
    # dL/dx = alpha_t [ -gamma (1-p_t)^(g-1) p(1-p)(2t-1) ce + (1-p_t)^g (p - t) ]
    dldx = alpha_t * (
        -gamma * one_m ** (gamma - 1) * p * (1 - p) * (2 * t - 1) * ce
        + one_m ** gamma * (p - t)
    )
    return ((g * dldx).astype(logits.dtype), None)


_focal_sparse_elem.defvjp(_focal_sparse_fwd, _focal_sparse_bwd)


def sigmoid_focal_loss_sparse(
    logits: jnp.ndarray,  # (..., C)
    label0: jnp.ndarray,  # (...,) int32 0-based fg class, -1 = background row
    weight: Optional[jnp.ndarray] = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss from integer labels (see ``_focal_sparse_elem``); numerics
    identical to ``sigmoid_focal_loss`` on the equivalent one-hot."""
    return _reduce(_focal_sparse_elem(logits, label0, gamma, alpha), weight, avg_factor)


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    beta: float = 1.0 / 9.0,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Huber-style bbox regression loss."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(
    logits: jnp.ndarray,  # (..., C)
    labels: jnp.ndarray,  # (...,) int
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor)


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    return _reduce(optax_sigmoid_ce(logits, targets), weight, avg_factor)


def iou_loss(
    pred: jnp.ndarray,  # (..., 4) xyxy
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,  # (...,)
    mode: str = "giou",
    offset: float = 1.0,
    eps: float = 1e-7,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Aligned (elementwise) IoU / GIoU loss between matching box pairs.

    ``square_iou`` is the YOLOX objective ``1 - iou^2``."""
    assert mode in ("iou", "giou", "linear_iou", "square_iou")
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0] + offset) * (pred[..., 3] - pred[..., 1] + offset)
    at = (target[..., 2] - target[..., 0] + offset) * (target[..., 3] - target[..., 1] + offset)
    union = jnp.maximum(ap + at - inter, eps)
    iou = inter / union
    if mode == "iou":
        loss = -jnp.log(jnp.clip(iou, eps, 1.0))
    elif mode == "linear_iou":
        loss = 1.0 - iou
    elif mode == "square_iou":
        loss = 1.0 - iou**2
    else:  # giou
        elt = jnp.minimum(pred[..., :2], target[..., :2])
        erb = jnp.maximum(pred[..., 2:4], target[..., 2:4])
        ewh = jnp.clip(erb - elt + offset, 0.0, None)
        enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
        giou = iou - (enclose - union) / enclose
        loss = 1.0 - giou
    return _reduce(loss, weight, avg_factor)


def dice_loss(
    probs: jnp.ndarray,  # (..., M) predicted probabilities (already sigmoid)
    targets: jnp.ndarray,  # (..., M) binary targets
    weight: Optional[jnp.ndarray] = None,  # (...,) per-instance weight
    eps: float = 1e-3,
    avg_factor: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dice loss over the last axis (the SOLO mask objective).

    ``1 - 2*sum(p*t) / (sum(p^2) + sum(t^2))`` per instance (the SOLO
    formulation: squared denominators, eps in numerator and denominator),
    reduced like the other losses via ``weight``/``avg_factor``.
    """
    probs = probs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    num = 2.0 * jnp.sum(probs * targets, axis=-1) + eps
    den = jnp.sum(probs * probs, axis=-1) + jnp.sum(targets * targets, axis=-1) + eps
    return _reduce(1.0 - num / den, weight, avg_factor)
