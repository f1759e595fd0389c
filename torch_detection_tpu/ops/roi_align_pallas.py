"""Pallas TPU RoIAlign: double-buffered window DMA + MXU interpolation.

The jnp fused kernel (``roi_align.multilevel_roi_align_fused``) materializes
per-roi (crop, crop, C) windows through vmapped ``dynamic_slice`` — XLA
lowers that to a gather running at ~1/5 of HBM bandwidth and round-trips the
3 GB of windows through HBM (measured 36 ms for 4x1000 rois @ 256ch on one
v5e).  This kernel instead:

  * keeps the flattened level pyramid in HBM **transposed and 2D**:
    ``(W_tot, H_max*C)`` — each roi's window DMAs straight into VMEM as
    ``(x_crop, y_crop*C)``, double-buffered so the next group's DMA overlaps
    the current group's compute (pallas_guide.md "Patterns: Double
    Buffering").  The layout is the load-bearing trick, twice over:
      - the window arrives with one spatial axis on sublanes and the other
        merged with channels on lanes — exactly the operand layout the
        first interpolation matmul needs.  A naive (crop, crop, C) window
        needs a full in-kernel relayout before the matmul (measured ~35% of
        kernel time);
      - Mosaic requires provably tile-aligned offsets: sublane (x) starts
        are 8-aligned by construction (``x-as-rows`` + origin alignment in
        ``_prepare_windows``), and lane (y) starts are ``y*C`` with C a
        multiple of 128 — both free, where the untransposed layout would
        need 8-aligned *row* starts that FPN window origins don't have;
  * applies the separable bilinear interpolation as two small MXU matmuls
    on the VMEM-resident window — the window never touches HBM — with the
    output landing directly in (y, x, C) order (no final transpose);
  * folds the sampling_ratio average-pool into the interpolation weights
    (the 2x2 sub-sample mean of separable products factorizes exactly into
    per-axis weight means), so the kernel emits (out, out, C) directly;
  * groups ``group`` rois per grid step with a block-diagonal weight matrix
    on the heavy first contraction, raising its matmul M dim from ``out``
    (7) to ``group*out`` — the off-diagonal zeros waste FLOPs but the
    systolic array rows were idle anyway;
  * picks each roi's window DMA shape from a small static set by the roi's
    actual interpolation-weight support (``multi_crop``): the needed window
    AREA is ~constant over aspect ratios (FPN band geometry), so
    rectangular shapes cut DMA bytes ~2x with identical numerics — the
    weights are exactly zero outside the support, so the skipped scratch
    region (zero-scrubbed once, then stale finite values) contributes
    nothing to the matmuls.

The weight/coordinate preparation is plain JAX (cheap, fused by XLA) and is
shared with the jnp implementation via ``roi_align._prepare_windows``.

Reference context: the upstream framework (TCGGroup/Torch_Detection) never
built an RoI tier (``models/__init__.py`` empty; SURVEY.md §2 #32-33); this
is the TPU-native design for it.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(
    jax.jit,
    static_argnames=("c", "crop_r", "crop_l", "out_size", "shapes", "group"),
)
def _roi_window_interp_pallas(
    flat2: jax.Array,  # (W_tot, H_max*C): rows = x (8-aligned), lanes = (y, c)
    starts: jax.Array,  # (R, 3) int32: (x_row_start, y_lane_start, shape_id)
    w_rows: jax.Array,  # (R//G, G*out, G*crop_r) block-diag x weights
    w_lanes: jax.Array,  # (R//G, G, out, crop_l) y weights
    c: int,
    crop_r: int,  # window rows (x axis), 8-aligned sizes
    crop_l: int,  # window lane-groups (y axis)
    out_size: int,
    shapes: tuple,  # static ((rows, lane_groups), ...); starts[:,2] indexes it
    group: int,
) -> jax.Array:  # (R, out, out, C)
    r = starts.shape[0]
    dtype = flat2.dtype
    g_n = r // group

    # TPU MXU default precision truncates f32 operands to bf16 mantissas;
    # keep f32 inputs exact (bf16 inputs use the native single-pass rate)
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def kernel(starts_ref, flat_ref, wr_ref, wl_ref, out_ref, win, sems):
        i = pl.program_id(0)

        def dma_for(slot, idx, g, h, w):
            r0 = starts_ref[idx, 0]
            c0 = starts_ref[idx, 1]  # lane units: y0 * C, C % 128 == 0
            return pltpu.make_async_copy(
                flat_ref.at[
                    pl.ds(pl.multiple_of(r0, 8), h),
                    pl.ds(pl.multiple_of(c0, c), w * c),
                ],
                win.at[slot, pl.ds(g * crop_r, h), pl.ds(0, w * c)],
                sems.at[slot],
            )

        def issue(slot, step, op):
            # one static-shape DMA per (roi, shape) branch; weights are
            # exactly 0 beyond the roi's support rows/lanes, so the skipped
            # scratch region (zero-scrubbed below, then stale finite values
            # from earlier rois) contributes nothing to the matmuls
            for g in range(group):
                idx = step * group + g
                sid = starts_ref[idx, 2]
                for k, (h, w) in enumerate(shapes):
                    @pl.when(sid == k)
                    def _(g=g, h=h, w=w):
                        getattr(dma_for(slot, idx, g, h, w), op)()

        @pl.when(i == 0)
        def _():
            # scrub uninitialized VMEM (could hold NaN bit patterns; NaN*0
            # would poison the zero-weight region trick)
            win[...] = jnp.zeros((2, group * crop_r, crop_l * c), dtype)
            issue(0, 0, "start")

        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            issue((i + 1) % 2, i + 1, "start")

        issue(i % 2, i, "wait")
        windows = win[i % 2]  # (G*crop_r, crop_l*C), x on sublanes

        # x-interp: (G*out, G*crop_r) @ (G*crop_r, crop_l*C) on the MXU —
        # the window is already in this layout (no relayout), f32 accumulate
        tmp = jax.lax.dot_general(
            wr_ref[0],
            windows,
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        ).reshape(group * out_size, crop_l, c).astype(dtype)
        for g in range(group):
            tmp_g = tmp[g * out_size:(g + 1) * out_size]  # (out_x, crop_l, C)
            # y-interp: contract the y axis -> (out_y, out_x, C), final order
            out = jax.lax.dot_general(
                wl_ref[0, g],
                tmp_g,
                (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )
            out_ref[g] = out.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # flat stays in HBM
            pl.BlockSpec((1, group * out_size, group * crop_r), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, group, out_size, crop_l), lambda i, s: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (group, out_size, out_size, c), lambda i, s: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, group * crop_r, crop_l * c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, out_size, out_size, c), dtype),
        grid_spec=grid_spec,
    )(starts, flat2, w_rows, w_lanes)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def multilevel_roi_align_pallas(
    feats: Sequence[jax.Array],  # per level (H_l, W_l, C), one image
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    crop: int = 40,
    multi_crop: bool = True,
    group: int = 1,
) -> jax.Array:
    """Drop-in replacement for ``multilevel_roi_align_fused`` (same exactness
    contract: rois spanning <= crop-1 cells at their routed level).

    Differentiable: ``pallas_call`` has no autodiff rule, so a custom VJP
    backs the backward pass with the mathematically-identical fused jnp
    implementation's transpose (einsum-transpose + window scatter-add) —
    the two-stage TRAIN step differentiates through RoIAlign into the
    FPN/backbone.  Roi coordinates get zero gradient (they are
    stop-gradient proposals in every training config, matching the
    standard detector contract)."""
    flat2, starts, wr_p, wl_p, shapes, crop_r, crop_l, c = _transposed_prep(
        feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
        multi_crop,
    )
    r = rois.shape[0]

    # cap the group by the double-buffered window scratch budget (~8 MB of
    # the ~16 MB VMEM): f32 features halve the usable group
    bytes_per_roi = 2 * crop_r * crop_l * c * flat2.dtype.itemsize
    while group > 1 and (group * bytes_per_roi > 8 * 2**20 or r % group != 0):
        group -= 1
    # block-diagonal x weights: (R//G, G*out, G*crop_r) (G=1: plain per-roi)
    wrg = wr_p.reshape(r // group, group, out_size, crop_r)
    blk = jnp.zeros((r // group, group, out_size, group, crop_r), flat2.dtype)
    for g in range(group):
        blk = blk.at[:, g, :, g, :].set(wrg[:, g])
    wr_blk = blk.reshape(r // group, group * out_size, group * crop_r)
    wl_g = wl_p.reshape(r // group, group, out_size, crop_l)
    return _roi_window_interp_pallas(
        flat2, starts, wr_blk, wl_g, c, crop_r, crop_l, out_size, shapes, group
    )


def _transposed_prep(
    feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
    multi_crop,
):
    """Shared fwd/bwd prep: transposed 2D pyramid + starts + pooled weights.

    Transposed: feed (W, H, C) features and y/x-swapped rois, so the prep's
    "rows" are the image x axis (8-aligned origins + 8-rounded level offsets
    via y_align) and its "columns" are the image y axis (lane offsets y*C
    are always 128-aligned — no widening needed)."""
    from .roi_align import _prepare_windows, _weight_support

    crop_r = crop + 8  # x window rows, widened for the 8-alignment
    crop_l = crop  # y window lane groups
    featsT = [jnp.swapaxes(f, 0, 1) for f in feats]
    roisT = rois[:, jnp.array([1, 0, 3, 2])]
    flat, starts, w_rows, w_lanes = _prepare_windows(
        featsT, roisT, strides, out_size, sampling_ratio, finest_scale, crop_r,
        crop_x=crop_l, x_align=1, y_align=8,
    )
    r = rois.shape[0]
    c = flat.shape[-1]
    full = (crop_r, crop_l)
    if multi_crop:
        # candidate (rows, lane_groups) window shapes, bytes ascending; row
        # sizes sublane-aligned.  Every roi falls back to the full window if
        # nothing smaller fits, so exactness is never traded.
        cand = [
            (h, w)
            for (h, w) in ((24, 32), (32, 24), (32, 32), (40, 40))
            if h <= crop_r and w <= crop_l and (h, w) != full
        ]
        shapes = tuple(sorted(cand, key=lambda s: s[0] * s[1])) + (full,)
        nr = _weight_support(w_rows)  # (R,)
        nl = _weight_support(w_lanes)
        sid = jnp.full((r,), len(shapes) - 1, jnp.int32)
        for k in range(len(shapes) - 2, -1, -1):
            h, w = shapes[k]
            sid = jnp.where((nr <= h) & (nl <= w), jnp.int32(k), sid)
    else:
        shapes = (full,)
        sid = jnp.zeros((r,), jnp.int32)
    # 2D pyramid layout: (W_tot, H_max, C) -> (W_tot, H_max*C) is a free
    # bitcast; column starts become lane offsets (multiples of C)
    flat2 = flat.reshape(flat.shape[0], -1)
    starts = jnp.stack([starts[:, 0], starts[:, 1] * c, sid], axis=-1)

    # fold the sampling_ratio mean-pool into the separable weights
    wr_p = w_rows.reshape(r, out_size, sampling_ratio, crop_r).mean(2).astype(flat.dtype)
    wl_p = w_lanes.reshape(r, out_size, sampling_ratio, crop_l).mean(2).astype(flat.dtype)
    return flat2, starts, wr_p, wl_p, shapes, crop_r, crop_l, c


def _transposed_level_offsets(feats, crop_r):
    """Static per-level (row_offset, W_l, H_l) in the transposed pyramid,
    mirroring _prepare_windows' padding rules (rows padded to >= crop_r and
    rounded to 8 via y_align)."""
    offs = []
    off = 0
    for f in feats:
        h_l, w_l = f.shape[:2]
        rows = max(w_l, crop_r)  # transposed: rows = W_l
        rows = ((rows + 7) // 8) * 8
        offs.append((off, w_l, h_l))
        off += rows
    return offs, off


def _pallas_roi_fwd(
    feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
    multi_crop, group,
):
    out = multilevel_roi_align_pallas(
        feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
        multi_crop, group,
    )
    return out, (list(feats), rois)


@functools.partial(
    jax.jit,
    static_argnames=("c", "crop_r", "crop_l", "out_size", "shapes"),
)
def _roi_window_bwd_pallas(
    dflat0: jax.Array,  # (W_tot, H_max*C) zeros, donated as the accumulator
    starts: jax.Array,  # (R, 3) int32: (x_row_start, y_lane_start, shape_id)
    g: jax.Array,  # (R, out, out, C) output cotangent [ty, tx, c]
    wr: jax.Array,  # (R, out, crop_r) pooled x weights
    wl: jax.Array,  # (R, out, crop_l) pooled y weights
    c: int,
    crop_r: int,
    crop_l: int,
    out_size: int,
    shapes: tuple,
) -> jax.Array:  # accumulated (W_tot, H_max*C)
    """Transpose of the forward window kernel: per-roi window cotangent
    dwin = Wr^T @ (sum_ty wl[ty] (x) g[ty]) lands directly in the flat2
    window layout, then a serialized read-modify-write DMA accumulates it
    into the pyramid.  The sequential TPU grid makes the RMW race-free
    (overlapping roi windows are common); the current roi's dwin compute
    overlaps the previous roi's write-back DMA.  ~3.4x over the fused jnp
    VJP (51 -> 15 ms of a b4 Faster R-CNN train step)."""
    r = starts.shape[0]
    dtype = dflat0.dtype
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def kernel(starts_ref, flat_ref, g_ref, wr_ref, wl_ref, out_ref, win, sems):
        i = pl.program_id(0)

        def rd(idx, h, w):
            r0 = starts_ref[idx, 0]
            c0 = starts_ref[idx, 1]
            return pltpu.make_async_copy(
                out_ref.at[
                    pl.ds(pl.multiple_of(r0, 8), h),
                    pl.ds(pl.multiple_of(c0, c), w * c),
                ],
                win.at[pl.ds(0, h), pl.ds(0, w * c)],
                sems.at[0],
            )

        def wrb(idx, h, w):
            r0 = starts_ref[idx, 0]
            c0 = starts_ref[idx, 1]
            return pltpu.make_async_copy(
                win.at[pl.ds(0, h), pl.ds(0, w * c)],
                out_ref.at[
                    pl.ds(pl.multiple_of(r0, 8), h),
                    pl.ds(pl.multiple_of(c0, c), w * c),
                ],
                sems.at[1],
            )

        def branched(idx, fn):
            sid = starts_ref[idx, 2]
            for k, (h, w) in enumerate(shapes):
                @pl.when(sid == k)
                def _(h=h, w=w):
                    fn(h, w)

        # dwin = Wr^T @ dtmp, dtmp[tx, (l, c)] = sum_ty wl[ty, l] * g[ty, tx, c]
        # (computed before the RMW waits so it overlaps the previous write)
        # (cast to f32 BEFORE the broadcasts: Mosaic only supports
        # non-no-op minor-dim insertion for 32-bit types)
        gblk = g_ref[0].astype(jnp.float32)  # (out_y, out_x, C)
        wl_r = wl_ref[0].astype(jnp.float32)  # (out_y, crop_l)
        dtmp = jnp.zeros((out_size, crop_l, c), jnp.float32)
        for ty in range(out_size):
            dtmp = dtmp + wl_r[ty][None, :, None] * gblk[ty][:, None, :]
        dwin = jax.lax.dot_general(
            wr_ref[0],  # (out_x, crop_r)
            dtmp.reshape(out_size, crop_l * c).astype(dtype),
            (((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        ).astype(dtype)  # (crop_r, crop_l*C) — the flat2 window layout

        @pl.when(i > 0)
        def _():
            branched(i - 1, lambda h, w: wrb(i - 1, h, w).wait())

        branched(i, lambda h, w: rd(i, h, w).start())
        branched(i, lambda h, w: rd(i, h, w).wait())

        def add_and_write(h, w):
            win[pl.ds(0, h), pl.ds(0, w * c)] += dwin[:h, : w * c]
            wrb(i, h, w).start()

        branched(i, add_and_write)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            branched(i, lambda h, w: wrb(i, h, w).wait())

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # the donated accumulator
            pl.BlockSpec((1, out_size, out_size, c), lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((1, out_size, crop_r), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, out_size, crop_l), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((crop_r, crop_l * c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(dflat0.shape, dtype),
        grid_spec=grid_spec,
        input_output_aliases={1: 0},  # dflat0 (after the scalar operand) -> out
    )(starts, dflat0, g, wr, wl)


def _pallas_roi_bwd(
    strides, out_size, sampling_ratio, finest_scale, crop, multi_crop, group,
    residuals, g,
):
    feats, rois = residuals

    if jax.devices()[0].platform != "tpu":
        # safety net: off-TPU (e.g. a CPU trace of the custom_vjp) use the
        # fused jnp implementation's VJP
        from .roi_align import multilevel_roi_align_fused

        _, vjp_fn = jax.vjp(
            lambda fs: multilevel_roi_align_fused(
                fs, rois, strides, out_size, sampling_ratio, finest_scale, crop
            ),
            feats,
        )
        (dfeats,) = vjp_fn(g.astype(feats[0].dtype))
        return dfeats, jnp.zeros_like(rois)

    flat2, starts, wr_p, wl_p, shapes, crop_r, crop_l, c = _transposed_prep(
        feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
        multi_crop,
    )
    dflat0 = jnp.zeros(flat2.shape, flat2.dtype)
    dflat2 = _roi_window_bwd_pallas(
        dflat0, starts, g.astype(flat2.dtype), wr_p, wl_p,
        c, crop_r, crop_l, out_size, shapes,
    )
    # unflatten: (W_tot, H_max*C) -> per-level (H_l, W_l, C) cotangents
    offs, _ = _transposed_level_offsets(feats, crop_r)
    w_max = max(max(f.shape[0] for f in feats), crop_r, crop_l)
    dflatT = dflat2.reshape(dflat2.shape[0], w_max, c)
    dfeats = [
        jnp.swapaxes(dflatT[off:off + w_l, :h_l, :], 0, 1).astype(f.dtype)
        for (off, w_l, h_l), f in zip(offs, feats)
    ]
    return dfeats, jnp.zeros_like(rois)


multilevel_roi_align_pallas.defvjp(_pallas_roi_fwd, _pallas_roi_bwd)
