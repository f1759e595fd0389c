"""Sharded training step (pjit/GSPMD).

The reference has no trainer (SURVEY.md §2 #33 [ABSENT]); this is the
TPU-native design: one jitted function carrying (params, opt_state) -> next
state, with the batch sharded over the mesh's ``data`` axis and params
sharded by ``parallel.mesh.param_sharding_rules`` (replicated for DP,
channel-sharded over ``model`` for TP).  GSPMD inserts the gradient psum /
all-gathers; no hand-written collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, param_shardings, replicated


@dataclasses.dataclass
class TrainState:
    """Minimal functional train state (pytree)."""

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state, self.batch_stats), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(params, tx: optax.GradientTransformation, batch_stats=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
    )


def make_train_step(
    loss_fn: Callable[[Any, Any, Dict[str, jax.Array]], Tuple[jax.Array, Dict]],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
    skip_nonfinite: bool = True,
):
    """Build a jitted train step.

    ``loss_fn(params, batch_stats, batch) -> (loss, metrics)`` must be pure.
    With a mesh, the returned step expects the batch pre-sharded over
    ``data`` and keeps state shardings fixed across steps (stable layouts =
    no resharding traffic between steps).

    ``skip_nonfinite`` is the failure-detection guard the reference lacks
    (SURVEY.md §5): a step whose loss or global grad norm is NaN/Inf applies
    a zero update instead of corrupting the params — on-device ``where``, no
    host sync, so the guard is free.
    """

    import inspect

    loss_wants_step = "step" in inspect.signature(loss_fn).parameters

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        if loss_wants_step:
            bound = partial(loss_fn, step=state.step)
        else:
            bound = loss_fn
        (loss, metrics), grads = jax.value_and_grad(bound, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        if skip_nonfinite:
            gnorm = optax.global_norm(grads)
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            # on a skipped step revert BOTH params and optimizer state: with
            # zeroed grads the chain still emits wd*params + momentum*buf, so
            # letting either through would desynchronize params from opt_state
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params
            )
            new_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old) if isinstance(new, jax.Array) else new,
                new_opt, state.opt_state,
            )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=state.batch_stats,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        if skip_nonfinite:
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())

    def sharded_compile(state_example):
        ps = param_shardings(mesh, state_example.params)
        os_ = param_shardings(mesh, state_example.opt_state)
        bs = (
            param_shardings(mesh, state_example.batch_stats)
            if state_example.batch_stats is not None
            else None
        )
        state_sh = TrainState(replicated(mesh), ps, os_, bs)
        return jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_sharding(mesh)),
            out_shardings=(state_sh, replicated(mesh)),
            donate_argnums=(0,) if donate_state else (),
        )

    return sharded_compile


def make_optimizer(
    learning_rate=0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: Optional[float] = None,
    frozen_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """SGD+momentum+WD (the detection default), with optional global-norm
    clipping and a freeze mask (True = train, False = frozen — the TPU
    analog of the reference's ``bn_frozen`` / ``frozen_stages`` flags)."""
    chain = []
    if frozen_mask is not None:
        # zero frozen grads FIRST (optax.masked alone would pass the raw
        # gradient through as the update for unmasked leaves)
        inverted = jax.tree_util.tree_map(lambda m: not m, frozen_mask)
        chain.append(optax.masked(optax.set_to_zero(), inverted))
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    decay = optax.add_decayed_weights(weight_decay)
    if frozen_mask is not None:
        decay = optax.masked(decay, frozen_mask)  # no decay drift on frozen params
    chain.append(decay)
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    return optax.chain(*chain)
