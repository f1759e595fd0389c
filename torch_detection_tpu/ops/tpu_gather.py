"""Exact matmul/reduction replacements for small-table gathers on TPU.

TPU lowers ``table[idx]`` (a gather) to element-indexed HBM loads; for the
detection target pipelines — N ~ 180k anchors indexing a G ~ 100-row gt
table per image — that gather alone measured **11.3 ms** of a 28 ms
RetinaNet loss tier @ b8 800x1216 (round-3 probe), vs ~1 ms for the same
selection expressed as a one-hot contraction the MXU/VPU can stream.

Both helpers are numerically EXACT equivalents of indexing, not
approximations: every one-hot row has a single 1.0, so each output element
is one ``1.0 * v`` product and a sum over zeros — no rounding regardless of
accumulation order.  ``Precision.HIGHEST`` keeps the default TPU MXU mode
from truncating f32 operands to bf16 (which WOULD round the table values).

Indexing contract difference: XLA's gather clamps out-of-range indices;
these return zeros for them.  Every call site clips its indices first
(``safe_gt`` pattern), so the difference is unobservable in-repo.

No reference counterpart (the reference has no device-side target pipeline —
SURVEY.md §2 #32 [ABSENT]); torch's ``tensor[idx]`` on CUDA is a fast
hardware gather, which is exactly what TPU lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _restore_dtype(out: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.bool_:
        return out > 0.5
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.round(out).astype(dtype)
    return out.astype(dtype)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a small table, as a one-hot matmul.

    table: (G,) or (G, D) — any float/int/bool dtype whose values are
    exactly representable in f32 (box coords, labels, masks all are).
    idx: (N,) integer.  Returns (N,) or (N, D) in ``table.dtype``.
    Out-of-range indices yield 0 (callers clip; see module docstring).
    """
    squeeze = table.ndim == 1
    t2 = table[:, None] if squeeze else table
    g = t2.shape[0]
    onehot = (idx[:, None] == jnp.arange(g, dtype=idx.dtype)[None, :]).astype(
        jnp.float32
    )
    out = jax.lax.dot(
        onehot, t2.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )
    out = _restore_dtype(out, table.dtype)
    return out[:, 0] if squeeze else out


def take_per_row(values: jax.Array, idx: jax.Array) -> jax.Array:
    """``jnp.take_along_axis(values, idx, axis=1)`` squeezed, as a masked sum.

    values: (N, G) or (N, G, D); idx: (N,) integer with entries in [0, G).
    Returns (N,) or (N, D) in ``values.dtype``.  Uses ``where`` + sum (not
    ``0 * v``) so non-selected lanes may hold inf/nan sentinels safely.
    """
    g = values.shape[1]
    onehot = idx[:, None] == jnp.arange(g, dtype=idx.dtype)[None, :]  # (N, G)
    vf = values.astype(jnp.float32)
    if values.ndim == 2:
        out = jnp.sum(jnp.where(onehot, vf, 0.0), axis=1)
    else:
        out = jnp.sum(jnp.where(onehot[..., None], vf, 0.0), axis=1)
    return _restore_dtype(out, values.dtype)
