"""Fixed-shape class-wise NMS for TPU (pure jnp; no dynamic output counts).

Fills SURVEY.md §2 #32's NMS slot ([ABSENT] in the reference).  The
control-flow-heavy per-class loop a torch implementation would use is
re-designed for XLA:

  * class-wise suppression via the **coordinate-offset trick**: shift each
    box by ``class_id * (max_coord + 1)`` so boxes of different classes can
    never overlap, then run ONE greedy NMS over the top-K candidates across
    all classes — one kernel instead of C loops;
  * greedy suppression as a ``lax.fori_loop`` over the K sorted candidates
    updating a (K,) suppression vector against a precomputed (K, K) IoU
    matrix — exact greedy-NMS semantics, fixed shapes, no host sync;
  * outputs are padded to ``max_out`` with score 0 / label -1 rows, so the
    caller's shapes are static.

K (``pre_nms_top_k``) bounds both memory (K^2 IoU matrix) and the sequential
chain; 1-2k candidates is the practical detection regime.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # (max_out, 4)
    scores: jnp.ndarray  # (max_out,)
    labels: jnp.ndarray  # (max_out,) int32 0-based class id (0 for single-class), -1 pad
    valid: jnp.ndarray  # (max_out,) bool
    indices: Optional[jnp.ndarray] = None  # (max_out,) int32 original candidate index, -1 pad


def _greedy_suppress(iou: jnp.ndarray, iou_thr: float) -> jnp.ndarray:
    """Exact greedy NMS over score-sorted candidates, as a fixpoint iteration.

    ``iou`` is (K, K) for candidates sorted by descending score.  Returns a
    (K,) keep mask identical to sequential greedy NMS.

    TPU formulation: instead of K sequential steps, iterate
        alive <- NOT any_i (alive_i AND iou[i, j] > thr AND i < j)
    to its fixpoint.  The fixpoint is exactly the greedy solution (the
    recurrence alive[j] = ~OR_{i<j}(alive[i] & suppress[i,j]) has a unique
    solution); Jacobi iteration converges in O(longest suppression chain)
    steps — typically < 10 — and each step is ONE (K, K) masked reduction on
    the VPU instead of K tiny dependent ops.
    """
    k = iou.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    suppress = (iou > iou_thr) & (col > row)  # row i suppresses col j

    def cond(state):
        alive, prev, it = state
        return (it < k) & jnp.any(alive != prev)

    def body(state):
        alive, _, it = state
        killed = jnp.any(suppress & alive[:, None], axis=0)
        return jnp.logical_not(killed), alive, it + 1

    init = jnp.ones((k,), bool)
    alive, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.zeros((k,), bool), jnp.int32(0))
    )
    return alive


def nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    iou_thr: float = 0.5,
    score_thr: float = 0.0,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,
    offset: float = 1.0,
    pre_top_k: Optional[int] = None,
    approx_top_k: bool = False,
) -> NMSResult:
    """Single-class NMS, fixed output shape (padded).

    The candidate pool is decoupled from ``max_out``: suppression runs over
    the top ``pre_top_k`` candidates by score (default: ALL of them), and
    only then are the first ``max_out`` survivors kept — so slots freed by
    suppression backfill from lower-ranked candidates, matching true
    NMS-then-topk semantics.  ``pre_top_k`` bounds the (K, K) IoU matrix;
    set it when N is large.  ``labels`` is all zeros (single class);
    the kept candidates' original indices are in ``indices``.
    """
    n = boxes.shape[0]
    s = jnp.where(scores > score_thr, scores, -1.0)
    if valid is not None:
        s = jnp.where(valid, s, -1.0)
    k = max(min(n, pre_top_k) if pre_top_k is not None else n, 1)

    if approx_top_k and k < n:
        top_s, top_i = jax.lax.approx_max_k(s, k)
    else:
        top_s, top_i = jax.lax.top_k(s, k)
    top_b = boxes[top_i]
    iou = bbox_overlaps(top_b, top_b, offset=offset)
    keep = _greedy_suppress(iou, iou_thr) & (top_s > 0)

    # compact kept rows to the front (stable) and crop/pad to max_out
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, k)  # drop into an overflow slot
    out_b = jnp.zeros((k + 1, 4), boxes.dtype).at[dest].set(top_b)[:k]
    out_s = jnp.zeros((k + 1,), scores.dtype).at[dest].set(jnp.where(keep, top_s, 0.0))[:k]
    out_v = jnp.zeros((k + 1,), bool).at[dest].set(keep)[:k]
    out_i = jnp.full((k + 1,), -1, jnp.int32).at[dest].set(top_i.astype(jnp.int32))[:k]

    if k >= max_out:
        out_b, out_s, out_v, out_i = (a[:max_out] for a in (out_b, out_s, out_v, out_i))
    else:
        pad = max_out - k
        out_b = jnp.pad(out_b, ((0, pad), (0, 0)))
        out_s = jnp.pad(out_s, ((0, pad),))
        out_v = jnp.pad(out_v, ((0, pad),))
        out_i = jnp.pad(out_i, ((0, pad),), constant_values=-1)
    labels = jnp.where(out_v, 0, -1).astype(jnp.int32)
    indices = jnp.where(out_v, out_i, -1)
    return NMSResult(out_b, out_s, labels, out_v, indices)


def multiclass_nms(
    boxes: jnp.ndarray,  # (N, 4) or (N, C, 4) class-specific
    scores: jnp.ndarray,  # (N, C) — class scores WITHOUT background column
    iou_thr: float = 0.5,
    score_thr: float = 0.05,
    pre_nms_top_k: int = 1000,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,  # (N,) bool
    offset: float = 1.0,
    approx_top_k: bool = False,
) -> NMSResult:
    """Class-wise NMS over (N, C) scores in one fused pass.

    Candidates are the top ``pre_nms_top_k`` (box, class) pairs by score;
    suppression uses class-offset coordinates so only same-class pairs
    interact.  Returns ``max_out`` rows, padded; ``labels`` are 0-based
    class indices (-1 padding).  ``approx_top_k`` selects the candidate pool
    with ``jax.lax.approx_max_k`` (~2.5x faster on TPU; misses concentrate
    in the tail ranks of the pool, so detection quality is unaffected).
    """
    n, c = scores.shape
    flat_scores = scores.reshape(-1)  # (N*C,) box-major
    if valid is not None:
        flat_scores = jnp.where(jnp.repeat(valid, c), flat_scores, -1.0)
    flat_scores = jnp.where(flat_scores > score_thr, flat_scores, -1.0)

    k = min(n * c, pre_nms_top_k)
    if approx_top_k and k < n * c:
        top_s, top_flat = jax.lax.approx_max_k(flat_scores, k)
    else:
        top_s, top_flat = jax.lax.top_k(flat_scores, k)
    box_idx = top_flat // c
    cls_idx = (top_flat % c).astype(jnp.int32)

    if boxes.ndim == 3:  # class-specific regression
        cand = boxes[box_idx, cls_idx]
    else:
        cand = boxes[box_idx]

    # class-offset trick: disjoint coordinate islands per class
    max_coord = jnp.max(jnp.abs(cand)) + offset
    shifted = cand + (cls_idx.astype(cand.dtype) * (max_coord + 1.0))[:, None]
    iou = bbox_overlaps(shifted, shifted, offset=offset)
    keep = _greedy_suppress(iou, iou_thr) & (top_s > 0)

    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, k)
    out_b = jnp.zeros((k + 1, 4), cand.dtype).at[dest].set(cand)[:k]
    out_s = jnp.zeros((k + 1,), top_s.dtype).at[dest].set(jnp.where(keep, top_s, 0.0))[:k]
    out_l = jnp.full((k + 1,), -1, jnp.int32).at[dest].set(cls_idx)[:k]
    out_v = jnp.zeros((k + 1,), bool).at[dest].set(keep)[:k]
    out_i = jnp.full((k + 1,), -1, jnp.int32).at[dest].set(box_idx.astype(jnp.int32))[:k]

    if k >= max_out:
        out_b, out_s, out_l, out_v, out_i = (
            a[:max_out] for a in (out_b, out_s, out_l, out_v, out_i)
        )
    else:
        pad = max_out - k
        out_b = jnp.pad(out_b, ((0, pad), (0, 0)))
        out_s = jnp.pad(out_s, ((0, pad),))
        out_l = jnp.pad(out_l, ((0, pad),), constant_values=-1)
        out_v = jnp.pad(out_v, ((0, pad),))
        out_i = jnp.pad(out_i, ((0, pad),), constant_values=-1)
    out_l = jnp.where(out_v, out_l, -1)
    out_i = jnp.where(out_v, out_i, -1)
    return NMSResult(out_b, out_s, out_l, out_v, out_i)


def _soft_decay(iou_row: jnp.ndarray, method: str, sigma: float, iou_thr: float) -> jnp.ndarray:
    if method == "gaussian":
        return jnp.exp(-(iou_row * iou_row) / sigma)
    # linear: decay only above the overlap threshold
    return jnp.where(iou_row > iou_thr, 1.0 - iou_row, 1.0)


def soft_nms(
    boxes: jnp.ndarray,  # (N, 4)
    scores: jnp.ndarray,  # (N,)
    method: str = "gaussian",
    sigma: float = 0.5,
    iou_thr: float = 0.3,
    score_thr: float = 1e-3,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,
    offset: float = 1.0,
    pre_top_k: Optional[int] = None,
) -> NMSResult:
    """Soft-NMS (Bodla et al., ICCV 2017): overlap DECAYS neighbor scores
    instead of deleting them — recovers occluded same-class objects hard NMS
    drops.

    Unlike hard NMS (whose greedy recurrence is a fixpoint solvable in ~10
    Jacobi sweeps — ``_greedy_suppress``), soft-NMS rescores after every
    pick, so the chain is genuinely sequential in ``max_out``.  TPU
    formulation: a ``lax.scan`` of exactly ``max_out`` steps over the top-K
    candidate pool — each step is one argmax, one dynamic row-slice of the
    precomputed (K, K) IoU matrix, and one (K,) multiply on the VPU.  With
    max_out=100, K=1000 that is ~100 cheap fused steps, all fixed-shape.
    Picks whose decayed score falls below ``score_thr`` pad the output
    (exact paper semantics: the pool is re-ranked by decayed score, and
    decay is applied by every picked box in pick order).
    """
    assert method in ("gaussian", "linear")
    n = boxes.shape[0]
    s = scores.astype(jnp.float32)
    if valid is not None:
        s = jnp.where(valid, s, -1.0)
    k = max(min(n, pre_top_k) if pre_top_k is not None else n, 1)
    top_s, top_i = jax.lax.top_k(s, k)
    top_b = boxes[top_i]
    iou = bbox_overlaps(top_b, top_b, offset=offset).astype(jnp.float32)

    def body(w, _):
        i = jnp.argmax(w)
        s_i = w[i]
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, 0)[0]  # (K,)
        w = w * _soft_decay(row, method, sigma, iou_thr)
        w = w.at[i].set(-jnp.inf)  # picked: out of the pool
        return w, (i, s_i)

    _, (picked, picked_s) = jax.lax.scan(body, top_s, None, length=max_out)
    out_v = picked_s > score_thr
    out_b = jnp.where(out_v[:, None], top_b[picked], 0.0)
    out_s = jnp.where(out_v, picked_s, 0.0)
    out_i = jnp.where(out_v, top_i[picked].astype(jnp.int32), -1)
    labels = jnp.where(out_v, 0, -1).astype(jnp.int32)
    return NMSResult(out_b, out_s, labels, out_v, out_i)


def multiclass_soft_nms(
    boxes: jnp.ndarray,  # (N, 4) or (N, C, 4)
    scores: jnp.ndarray,  # (N, C)
    method: str = "gaussian",
    sigma: float = 0.5,
    iou_thr: float = 0.3,
    score_thr: float = 0.05,
    pre_nms_top_k: int = 1000,
    max_out: int = 100,
    valid: Optional[jnp.ndarray] = None,
    offset: float = 1.0,
    approx_top_k: bool = False,
) -> NMSResult:
    """Class-wise soft-NMS in one pass via the same coordinate-offset trick
    as ``multiclass_nms``: cross-class pairs land in disjoint coordinate
    islands, so their IoU is 0 and their decay factor is exactly 1."""
    n, c = scores.shape
    flat_scores = scores.reshape(-1).astype(jnp.float32)
    if valid is not None:
        flat_scores = jnp.where(jnp.repeat(valid, c), flat_scores, -1.0)
    flat_scores = jnp.where(flat_scores > score_thr, flat_scores, -1.0)

    k = min(n * c, pre_nms_top_k)
    if approx_top_k and k < n * c:
        top_s, top_flat = jax.lax.approx_max_k(flat_scores, k)
    else:
        top_s, top_flat = jax.lax.top_k(flat_scores, k)
    box_idx = top_flat // c
    cls_idx = (top_flat % c).astype(jnp.int32)
    cand = boxes[box_idx, cls_idx] if boxes.ndim == 3 else boxes[box_idx]

    max_coord = jnp.max(jnp.abs(cand)) + offset
    shifted = cand + (cls_idx.astype(cand.dtype) * (max_coord + 1.0))[:, None]
    iou = bbox_overlaps(shifted, shifted, offset=offset).astype(jnp.float32)

    def body(w, _):
        i = jnp.argmax(w)
        s_i = w[i]
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, 0)[0]
        w = w * _soft_decay(row, method, sigma, iou_thr)
        w = w.at[i].set(-jnp.inf)
        return w, (i, s_i)

    _, (picked, picked_s) = jax.lax.scan(body, top_s, None, length=max_out)
    out_v = picked_s > score_thr
    out_b = jnp.where(out_v[:, None], cand[picked], 0.0)
    out_s = jnp.where(out_v, picked_s, 0.0)
    out_l = jnp.where(out_v, cls_idx[picked], -1)
    out_i = jnp.where(out_v, box_idx[picked].astype(jnp.int32), -1)
    return NMSResult(out_b, out_s, out_l, out_v, out_i)


def mask_iou_matrix(masks: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU of (K, M) binarized masks as two matmuls -> (K, K) f32.

    ``inter = m @ m.T``; union from the per-mask areas.  Pure MXU work —
    this is what makes Matrix NMS essentially free on TPU.
    """
    m = masks.astype(jnp.float32)
    inter = m @ m.T  # (K, K)
    areas = jnp.sum(m, axis=-1)
    union = areas[:, None] + areas[None, :] - inter
    return inter / jnp.maximum(union, eps)


def matrix_nms(
    masks: jnp.ndarray,  # (K, M) binarized masks, already score-DESC sorted
    labels: jnp.ndarray,  # (K,) int32 class ids
    scores: jnp.ndarray,  # (K,) descending
    valid: jnp.ndarray,  # (K,) bool
    method: str = "gauss",
    sigma: float = 2.0,
) -> jnp.ndarray:
    """SOLO Matrix NMS: decayed scores, no sequential suppression loop.

    Candidate b is decayed by ``min_a f(iou_ab) / f(comp_a)`` over all
    higher-ranked same-class a, where ``comp_a = max_k iou_ka`` over a's own
    higher-ranked same-class k (the compensation term) and ``f`` is
    ``exp(-sigma * iou^2)`` (gauss, the official code's form) or
    ``1 - iou`` (linear).  Wang et al., SOLOv2 (NeurIPS 2020) eq. (4) —
    entirely matmul/elementwise, unlike greedy NMS's data-dependent loop.

    Inputs must be sorted by descending score (the decode path's top-k
    already yields that order).  Returns the decayed scores (K,).
    """
    iou = mask_iou_matrix(masks)
    k = masks.shape[0]
    same = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    # dom[a, b]: a ranked strictly above b (triu(diagonal=1)), same class
    dom = same & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    iou_d = jnp.where(dom, iou, 0.0)  # (a, b)
    # compensation per index as the DOMINATED one: its max iou with any
    # higher-ranked same-class mask (official: (iou*label).triu(1).max(0))
    comp = jnp.max(iou_d, axis=0)  # (k,)
    if method == "gauss":
        decay = jnp.exp(-sigma * (iou_d**2 - comp[:, None] ** 2))
    else:
        decay = (1.0 - iou_d) / jnp.maximum(1.0 - comp[:, None], 1e-6)
    decay = jnp.where(dom, decay, 1.0)
    return scores * jnp.min(decay, axis=0)
