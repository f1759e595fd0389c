"""Device-mesh construction and sharding helpers.

The reference's only distributed touchpoint is rank/world-size queries via
``torch.distributed`` (``datasets/loader/dataset_sampler.py:94-103``); its
launcher/backend tier never existed.  Here the TPU-native replacement is
explicit: a ``jax.sharding.Mesh`` over ICI with named axes, NamedShardings
for batch/params, and GSPMD-inserted collectives — no hand-written NCCL
analog is needed (SURVEY.md §2 "Distributed communication backend").

Axes:
  * ``data``  — batch (data parallelism; gradient psum rides ICI),
  * ``model`` — channel sharding of wide conv kernels (tensor parallelism).

FSDP (ZeRO-3 semantics) is expressed purely through shardings: with
``fsdp=True`` the param-sharding rule additionally shards each large leaf
over the ``data`` axis (params, momentum buffers, and EMA all live 1/N-sized
per chip), and GSPMD inserts the all-gather at each use and turns the
gradient psum into a reduce-scatter.  No wrapper classes, no manual
collectives — the sharding annotation IS the strategy.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC sharding with batch over ``data`` AND image rows over ``model``.

    The CNN analog of sequence/context parallelism (SURVEY.md §5: the
    reference's "long context" is the spatial extent).  With input rows
    sharded, GSPMD spatially partitions every conv — each device computes
    its row band and exchanges kernel-halo rows with its neighbors via
    collective-permute riding ICI — so one image too large for a single
    chip's HBM (gigapixel canvases, whole-slide imagery) runs across the
    ``model`` axis without any kernel changes.
    """
    return NamedSharding(mesh, P("data", "model"))


def mesh_spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices from more than one process."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a pytree of host arrays on the mesh with batch-dim sharding.

    Single-process (all mesh devices addressable): a plain ``device_put``
    of the full global batch.  Multi-process (the mesh spans processes, as
    on a TPU pod): ``batch`` is this process's LOCAL shard — the slice its
    own ``DistributedGroupSampler`` produced — and the global array is
    assembled with ``jax.make_array_from_process_local_data`` (zero-copy of
    the local bytes; no cross-host batch traffic ever happens, matching the
    reference's per-rank loader slice at dataset_sampler.py:170-171).

    ``spatial=True`` additionally shards the H dim of 4-D NHWC leaves (the
    images) over the ``model`` axis — see :func:`spatial_sharding`.  Non-4-D
    leaves (gt slates, shapes, masks) keep plain batch sharding.
    """
    s = batch_sharding(mesh)
    sp = spatial_sharding(mesh)
    multiproc = mesh_spans_processes(mesh)

    def put(x):
        sh = s
        if spatial and getattr(x, "ndim", 0) == 4 and x.shape[1] % mesh.shape["model"] == 0:
            sh = sp
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def param_sharding_rules(mesh: Mesh, fsdp: bool = False, fsdp_min_size: int = 8192):
    """A tree_map-compatible function assigning NamedShardings to params.

    Tensor-parallel rule: shard the output-channel (last) dim of conv/dense
    kernels over the ``model`` axis when divisible; everything else is
    replicated.  With ``model=1`` this degenerates to pure data parallelism.

    FSDP rule (``fsdp=True``): additionally shard the largest still-unsharded
    dim of every leaf with >= ``fsdp_min_size`` elements over the ``data``
    axis — ZeRO-3 expressed as a sharding annotation.  Applied identically to
    params, optimizer state, and EMA (their leaves share shapes), it cuts the
    per-chip state memory ~Nx; GSPMD all-gathers each param at its use site
    and reduce-scatters its gradient.  Small leaves (biases, norm scales)
    stay replicated: the collective latency would dominate their bytes.
    """
    model_size = mesh.shape["model"]
    data_size = mesh.shape["data"]

    def rule(x) -> NamedSharding:
        shape = np.shape(x)
        spec = [None] * len(shape)
        if (
            model_size > 1
            and len(shape) >= 2
            and shape[-1] % model_size == 0
            and shape[-1] >= 2 * model_size
        ):
            spec[-1] = "model"
        if fsdp and data_size > 1 and int(np.prod(shape, dtype=np.int64)) >= fsdp_min_size:
            cands = [
                d for d in range(len(shape))
                if spec[d] is None and shape[d] % data_size == 0 and shape[d] > 0
            ]
            if cands:
                spec[max(cands, key=lambda d: shape[d])] = "data"
        if not any(spec):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*spec))

    return rule


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    rule = param_sharding_rules(mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)), params)


def param_shardings(mesh: Mesh, params, fsdp: bool = False):
    """The sharding pytree matching ``params`` (for jit in/out_shardings)."""
    rule = param_sharding_rules(mesh, fsdp=fsdp)
    return jax.tree_util.tree_map(rule, params)
