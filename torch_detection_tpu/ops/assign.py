"""Anchor <-> gt assignment and sampling (pure jnp, fixed shapes, masked).

Fills SURVEY.md §2 #32's assigner/sampler slot ([ABSENT] in the reference —
``core/__init__.py`` is empty).  Semantics follow the mmdetection
MaxIoUAssigner contract the reference's lineage implies:

  assigned_gt_inds: -1 = ignored, 0 = negative (background), k>0 = gt index k.

All inputs are padded fixed-shape arrays with validity masks — no dynamic
shapes anywhere, so the whole assignment jits into one fused elementwise
pass + a scatter for the best-anchor-per-gt rule.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps
from .tpu_gather import gather_rows, take_per_row


class AssignResult(NamedTuple):
    """Fixed-shape assignment output.

    assigned_gt_inds: (N,) int32 in {-1, 0, 1..G}
    max_overlaps:     (N,) float32, IoU with the assigned (or best) gt
    labels:           (N,) int32 class label of assigned gt (0 where none)
    """

    assigned_gt_inds: jnp.ndarray
    max_overlaps: jnp.ndarray
    labels: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MaxIoUAssigner:
    """Assign each anchor to the gt with the highest IoU.

    Rules (in order):
      1. everything starts ignored (-1);
      2. anchors with max-IoU < neg_iou_thr -> negative (0);
      3. anchors with max-IoU >= pos_iou_thr -> that gt;
      4. each gt's best anchor(s) -> that gt if IoU >= min_pos_iou
         (``gt_max_assign_all``: all ties, else first);
      5. anchors whose IoF with any ignore-region >= ignore_iof_thr -> ignored.
    """

    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    gt_max_assign_all: bool = True
    ignore_iof_thr: float = -1.0

    def __call__(
        self,
        anchors: jnp.ndarray,  # (N, 4)
        gt_boxes: jnp.ndarray,  # (G, 4) zero-padded
        gt_valid: jnp.ndarray,  # (G,) bool
        gt_labels: Optional[jnp.ndarray] = None,  # (G,) int32
        gt_boxes_ignore: Optional[jnp.ndarray] = None,  # (Gi, 4)
        gt_ignore_valid: Optional[jnp.ndarray] = None,  # (Gi,) bool
        anchor_valid: Optional[jnp.ndarray] = None,  # (N,) bool
    ) -> AssignResult:
        n = anchors.shape[0]
        overlaps = bbox_overlaps(anchors, gt_boxes)  # (N, G)
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

        max_overlaps = jnp.max(overlaps, axis=1)  # (N,)
        argmax_overlaps = jnp.argmax(overlaps, axis=1)  # (N,)

        any_gt = jnp.any(gt_valid)
        # start ignored; negatives below neg thr (only meaningful vs valid gts
        # — with no gt at all every anchor is negative)
        assigned = jnp.full((n,), -1, jnp.int32)
        is_neg = (max_overlaps < self.neg_iou_thr) | ~any_gt
        assigned = jnp.where(is_neg, 0, assigned)
        # positives at/above pos thr
        is_pos = any_gt & (max_overlaps >= self.pos_iou_thr)
        assigned = jnp.where(is_pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

        # rule 4: best anchor per gt. gt_argmax[g] = anchor with top IoU for g.
        gt_max = jnp.max(overlaps, axis=0)  # (G,)
        qualify = gt_valid & (gt_max >= self.min_pos_iou) & (gt_max > 0)
        if self.gt_max_assign_all:
            # all anchors tying the per-gt max get the gt
            tie = (overlaps == gt_max[None, :]) & qualify[None, :]
            # where an anchor ties several gts, prefer the highest-IoU one
            # (take the last matching gt like a scatter would; use argmax of
            # tie-masked overlaps for determinism)
            tie_any = jnp.any(tie, axis=1)
            tie_best = jnp.argmax(jnp.where(tie, overlaps, -jnp.inf), axis=1)
            assigned = jnp.where(tie_any, tie_best.astype(jnp.int32) + 1, assigned)
        else:
            gt_argmax = jnp.argmax(overlaps, axis=0)  # (G,)
            assigned = assigned.at[gt_argmax].set(
                jnp.where(qualify, jnp.arange(gt_boxes.shape[0], dtype=jnp.int32) + 1,
                          assigned[gt_argmax])
            )

        # rule 5: ignore regions (IoF of anchor vs ignore box)
        if (
            self.ignore_iof_thr > 0
            and gt_boxes_ignore is not None
            and gt_boxes_ignore.shape[0] > 0
        ):
            iof = bbox_overlaps(anchors, gt_boxes_ignore, mode="iof")
            if gt_ignore_valid is not None:
                iof = jnp.where(gt_ignore_valid[None, :], iof, -1.0)
            ignore_hit = jnp.max(iof, axis=1) >= self.ignore_iof_thr
            assigned = jnp.where(ignore_hit, -1, assigned)

        # anchors outside the valid image region are ignored
        if anchor_valid is not None:
            assigned = jnp.where(anchor_valid, assigned, -1)

        if gt_labels is not None:
            safe_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
            # one-hot matmul, not gt_labels[safe_idx]: TPU small-table
            # gathers are ~10x off roofline at anchor scale (ops/tpu_gather)
            labels = jnp.where(assigned > 0, gather_rows(gt_labels, safe_idx), 0)
        else:
            labels = jnp.zeros((n,), jnp.int32)
        return AssignResult(assigned, max_overlaps, labels)


@dataclasses.dataclass(frozen=True)
class GridAssigner:
    """YOLO grid assignment: positives restricted to *responsible* anchors.

    Same rule ladder as MaxIoUAssigner, except rules 3-4 only consider
    anchors whose ``responsible`` flag is set (YOLO: the anchors of the grid
    cell containing a gt's center — ``YOLOAnchorGenerator.responsible_flags``).
    The negative rule (2) still looks at ALL anchors' best IoU, so a
    non-responsible anchor overlapping a gt above ``neg_iou_thr`` stays
    ignored (-1) rather than becoming a negative.
    """

    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0

    def __call__(
        self,
        anchors: jnp.ndarray,  # (N, 4)
        responsible: jnp.ndarray,  # (N,) bool
        gt_boxes: jnp.ndarray,  # (G, 4) zero-padded
        gt_valid: jnp.ndarray,  # (G,) bool
        gt_labels: Optional[jnp.ndarray] = None,  # (G,)
        anchor_valid: Optional[jnp.ndarray] = None,  # (N,) bool
    ) -> AssignResult:
        n = anchors.shape[0]
        overlaps = bbox_overlaps(anchors, gt_boxes)  # (N, G)
        overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
        max_overlaps = jnp.max(overlaps, axis=1)

        any_gt = jnp.any(gt_valid)
        assigned = jnp.full((n,), -1, jnp.int32)
        is_neg = (max_overlaps < self.neg_iou_thr) | ~any_gt
        assigned = jnp.where(is_neg, 0, assigned)

        # rules 3-4 see only responsible anchors
        ovr_resp = jnp.where(responsible[:, None], overlaps, -1.0)
        max_r = jnp.max(ovr_resp, axis=1)
        arg_r = jnp.argmax(ovr_resp, axis=1).astype(jnp.int32)
        is_pos = any_gt & responsible & (max_r >= self.pos_iou_thr)
        assigned = jnp.where(is_pos, arg_r + 1, assigned)

        # rule 4: each gt claims its best responsible anchor (>= min_pos_iou);
        # an anchor tying several gts prefers the highest-IoU one (same
        # deterministic tie-break as MaxIoUAssigner)
        gt_max = jnp.max(ovr_resp, axis=0)  # (G,)
        qualify = gt_valid & (gt_max >= self.min_pos_iou) & (gt_max > 0)
        tie = (ovr_resp == gt_max[None, :]) & qualify[None, :]
        tie_any = jnp.any(tie, axis=1)
        tie_best = jnp.argmax(jnp.where(tie, ovr_resp, -jnp.inf), axis=1)
        assigned = jnp.where(tie_any, tie_best.astype(jnp.int32) + 1, assigned)

        if anchor_valid is not None:
            assigned = jnp.where(anchor_valid, assigned, -1)

        if gt_labels is not None:
            safe_idx = jnp.clip(assigned - 1, 0, gt_boxes.shape[0] - 1)
            labels = jnp.where(assigned > 0, gather_rows(gt_labels, safe_idx), 0)
        else:
            labels = jnp.zeros((n,), jnp.int32)
        return AssignResult(assigned, max_overlaps, labels)


@dataclasses.dataclass(frozen=True)
class ATSSAssigner:
    """Adaptive Training Sample Selection (Zhang et al., CVPR 2020).

    Per gt: take the ``topk`` anchors closest in center distance within each
    pyramid level as candidates, set the positive-IoU threshold to
    mean + std of the candidate IoUs, and keep candidates at/above it whose
    center lies inside the gt.  Anchors claimed by several gts go to the
    highest-IoU one.

    TPU formulation (all fixed shapes): the per-level top-k runs on the
    (G, N_l) transposed distance matrix; candidate IoUs/centers are
    small-output gathers (G x L*k rows — plain indexing is fine at this
    scale, see ops/tpu_gather.py); the candidate -> anchor scatter writes
    L*k*G flags into the (N, G) positive mask, and the final per-anchor
    argmax resolves multi-gt claims.  std matches torch's unbiased estimator
    (the semantics mmdetection's ATSS uses).

    No reference counterpart (assigners are part of the empty ``core/`` tier,
    SURVEY.md §2 #32 [ABSENT]).
    """

    topk: int = 9

    def __call__(
        self,
        anchors: jnp.ndarray,  # (N, 4) flat, level-major
        level_counts: Tuple[int, ...],  # static per-level anchor counts
        gt_boxes: jnp.ndarray,  # (G, 4) zero-padded
        gt_valid: jnp.ndarray,  # (G,) bool
        gt_labels: Optional[jnp.ndarray] = None,  # (G,) int32
        anchor_valid: Optional[jnp.ndarray] = None,  # (N,) bool
        level_grids: Optional[Tuple[Tuple[int, int, float], ...]] = None,
        img_hw: Optional[jnp.ndarray] = None,  # (2,) un-padded (h, w)
    ) -> AssignResult:
        """``level_grids`` (per level ``(h, w, stride)``; requires one anchor
        per location, row-major level-major layout) enables the windowed
        candidate path: the per-gt per-level top-k runs over a small analytic
        grid window instead of the full (G, N_l) distance matrix, which is
        ~10x cheaper on TPU (the full top_k was 13 ms of a 15.7 ms assign @
        b8 COCO canvas).  Exact: a top-k-nearest anchor must rank <= k among
        the valid x coords AND the valid y coords (k closer columns would
        each contain a strictly closer anchor at the same row), so the k
        nearest valid coords per axis span a k x k window that provably
        contains the top-k; in-window enumeration is flat-index-ordered, so
        tie-breaking matches ``jax.lax.top_k``'s lowest-index rule.  With
        ``img_hw`` the valid anchors form a prefix sub-grid (centers inside
        the un-padded image) and the window is clamped into it — anchors
        outside contribute IoU -1 exactly like the masked full path."""
        n = anchors.shape[0]
        g = gt_boxes.shape[0]
        assert sum(level_counts) == n, (level_counts, n)

        overlaps = bbox_overlaps(anchors, gt_boxes)  # (N, G)
        if anchor_valid is not None:
            # anchors outside the un-padded image never become candidates
            overlaps = jnp.where(anchor_valid[:, None], overlaps, -1.0)

        acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
        gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5

        use_window = level_grids is not None and (
            anchor_valid is None or img_hw is not None
        )
        if use_window:
            cand_idx = self._window_candidates(
                anchors, level_counts, level_grids, gcx, gcy,
                img_hw if anchor_valid is not None else None,
            )
        else:
            # generic path: full (N, G) distance matrix + per-level top_k
            # (arbitrary anchor layouts / multi-anchor locations)
            # squared distance selects the same top-k; skip the sqrt
            dist2 = (acx[:, None] - gcx[None, :]) ** 2 + (
                acy[:, None] - gcy[None, :]
            ) ** 2  # (N, G)
            if anchor_valid is not None:
                dist2 = jnp.where(anchor_valid[:, None], dist2, jnp.inf)

            cand_idx_parts = []
            start = 0
            for n_l in level_counts:
                k_l = min(self.topk, n_l)
                d_l = dist2[start : start + n_l].T  # (G, N_l)
                _, idx = jax.lax.top_k(-d_l, k_l)  # (G, k_l) nearest
                cand_idx_parts.append(idx.astype(jnp.int32) + start)
                start += n_l
            cand_idx = jnp.concatenate(cand_idx_parts, axis=1)  # (G, K)
        k_total = cand_idx.shape[1]

        ov_t = overlaps.T  # (G, N)
        cand_iou = jnp.take_along_axis(ov_t, cand_idx, axis=1)  # (G, K)
        mean = jnp.mean(cand_iou, axis=1)
        var = jnp.sum((cand_iou - mean[:, None]) ** 2, axis=1) / max(k_total - 1, 1)
        thr = mean + jnp.sqrt(var)  # (G,)

        # candidate centers must lie inside the gt box
        ccx = jnp.take_along_axis(
            jnp.broadcast_to(acx[None, :], (g, n)), cand_idx, axis=1
        )
        ccy = jnp.take_along_axis(
            jnp.broadcast_to(acy[None, :], (g, n)), cand_idx, axis=1
        )
        eps = 0.01
        inside = (
            (ccx - gt_boxes[:, 0][:, None] > eps)
            & (ccy - gt_boxes[:, 1][:, None] > eps)
            & (gt_boxes[:, 2][:, None] - ccx > eps)
            & (gt_boxes[:, 3][:, None] - ccy > eps)
        )
        is_pos = (
            (cand_iou >= thr[:, None]) & inside & gt_valid[:, None]
        )  # (G, K)

        # scatter candidate flags back to the (N, G) anchor-major mask
        rows = cand_idx.reshape(-1)
        cols = jnp.broadcast_to(
            jnp.arange(g, dtype=jnp.int32)[:, None], (g, k_total)
        ).reshape(-1)
        pos_mask = (
            jnp.zeros((n, g), jnp.int32)
            .at[rows, cols]
            .max(is_pos.reshape(-1).astype(jnp.int32))
            .astype(bool)
        )

        masked = jnp.where(pos_mask, overlaps, -jnp.inf)
        best_gt = jnp.argmax(masked, axis=1).astype(jnp.int32)  # (N,)
        has_pos = jnp.any(pos_mask, axis=1)
        assigned = jnp.where(has_pos, best_gt + 1, 0)
        if anchor_valid is not None:
            assigned = jnp.where(anchor_valid, assigned, -1)

        max_overlaps = jnp.where(has_pos, take_per_row(overlaps, best_gt), 0.0)
        if gt_labels is not None:
            labels = jnp.where(assigned > 0, gather_rows(gt_labels, best_gt), 0)
        else:
            labels = jnp.zeros((n,), jnp.int32)
        return AssignResult(assigned, max_overlaps.astype(jnp.float32), labels)

    def _window_candidates(
        self,
        anchors: jnp.ndarray,
        level_counts: Tuple[int, ...],
        level_grids: Tuple[Tuple[int, int, float], ...],
        gcx: jnp.ndarray,  # (G,)
        gcy: jnp.ndarray,  # (G,)
        img_hw: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """Per-level top-k nearest anchors via an analytic k x k grid window.

        The m nearest integer coords to a query q are the contiguous range
        starting at ceil(q - m/2) (round-centred; the lower coord wins exact
        half ties, matching top_k's lowest-index preference)."""
        g = gcx.shape[0]
        parts = []
        start = 0
        for (h_l, w_l, s_l), n_l in zip(level_grids, level_counts):
            assert h_l * w_l == n_l, (h_l, w_l, n_l)
            k_l = min(self.topk, n_l)
            ww = min(self.topk, w_l)
            wh = min(self.topk, h_l)
            c0x = (anchors[start, 0] + anchors[start, 2]) * 0.5
            c0y = (anchors[start, 1] + anchors[start, 3]) * 0.5
            if img_hw is not None:
                # valid anchors are the prefix sub-grid with centers strictly
                # inside the un-padded image; clamp the window into it so
                # every in-range gt sees only valid candidates
                wv = jnp.clip(
                    jnp.ceil((img_hw[1] - c0x) / s_l), 1, w_l
                ).astype(jnp.int32)
                hv = jnp.clip(
                    jnp.ceil((img_hw[0] - c0y) / s_l), 1, h_l
                ).astype(jnp.int32)
            else:
                wv, hv = w_l, h_l
            fx = (gcx - c0x) / s_l
            fy = (gcy - c0y) / s_l
            bx = jnp.clip(
                jnp.ceil(fx - ww * 0.5).astype(jnp.int32), 0,
                jnp.maximum(wv - ww, 0),
            )
            by = jnp.clip(
                jnp.ceil(fy - wh * 0.5).astype(jnp.int32), 0,
                jnp.maximum(hv - wh, 0),
            )
            jx = bx[:, None] + jnp.arange(ww, dtype=jnp.int32)  # (G, ww)
            iy = by[:, None] + jnp.arange(wh, dtype=jnp.int32)  # (G, wh)
            dx2 = (c0x + jx * s_l - gcx[:, None]) ** 2  # (G, ww)
            dy2 = (c0y + iy * s_l - gcy[:, None]) ** 2  # (G, wh)
            d2 = (dy2[:, :, None] + dx2[:, None, :]).reshape(g, wh * ww)
            if img_hw is not None:
                # window cells beyond the valid prefix (only when the prefix
                # is narrower than the window) sort last, like inf-masked
                # invalid anchors in the full path
                ok = (iy < hv)[:, :, None] & (jx < wv)[:, None, :]
                d2 = jnp.where(ok.reshape(g, wh * ww), d2, jnp.inf)
            flat = (start + iy[:, :, None] * w_l + jx[:, None, :]).reshape(
                g, wh * ww
            )
            _, sel = jax.lax.top_k(-d2, k_l)  # (G, k_l) over <= topk^2 cells
            parts.append(jnp.take_along_axis(flat, sel, axis=1))
            start += n_l
        return jnp.concatenate(parts, axis=1)  # (G, K)


class SampleResult(NamedTuple):
    """Fixed-shape sampling output: boolean masks over the anchor set."""

    pos_mask: jnp.ndarray  # (N,) bool
    neg_mask: jnp.ndarray  # (N,) bool


@dataclasses.dataclass(frozen=True)
class PseudoSampler:
    """Use every positive and negative (single-stage / focal-loss heads)."""

    def __call__(self, assign: AssignResult, rng: Optional[jax.Array] = None) -> SampleResult:
        return SampleResult(assign.assigned_gt_inds > 0, assign.assigned_gt_inds == 0)


@dataclasses.dataclass(frozen=True)
class RandomSampler:
    """Sample at most ``num`` anchors with a positive fraction, fixed-shape.

    TPU formulation: instead of choosing indices (dynamic shape), draw a
    random key per anchor and keep the top-k keys within each mask; the
    result stays a fixed-size boolean mask.  ``num`` bounds the *expected*
    count; masks may select fewer when fewer candidates exist.
    """

    num: int = 256
    pos_fraction: float = 0.5
    neg_pos_ub: float = -1.0

    def __call__(self, assign: AssignResult, rng: jax.Array) -> SampleResult:
        pos_mask = assign.assigned_gt_inds > 0
        neg_mask = assign.assigned_gt_inds == 0
        num_pos_wanted = int(self.num * self.pos_fraction)

        k_pos, k_neg = jax.random.split(rng)
        pos_keep = _topk_mask(pos_mask, num_pos_wanted, k_pos)
        n_pos = jnp.sum(pos_keep)
        num_neg_wanted = self.num - n_pos
        if self.neg_pos_ub > 0:
            num_neg_wanted = jnp.minimum(
                num_neg_wanted, (jnp.maximum(n_pos, 1) * self.neg_pos_ub).astype(n_pos.dtype)
            )
        neg_keep = _topk_mask(neg_mask, self.num, k_neg, dynamic_k=num_neg_wanted)
        return SampleResult(pos_keep, neg_keep)


def _topk_mask(mask: jnp.ndarray, k: int, rng: jax.Array, dynamic_k=None) -> jnp.ndarray:
    """Keep a uniformly-random subset of at most k True entries, fixed-shape."""
    n = mask.shape[0]
    scores = jnp.where(mask, jax.random.uniform(rng, (n,)), -1.0)
    # rank of each entry among the masked scores (descending)
    order = jnp.argsort(-scores)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    limit = k if dynamic_k is None else dynamic_k
    return mask & (ranks < limit)
