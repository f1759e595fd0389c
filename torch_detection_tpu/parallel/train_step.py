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
):
    """Build a jitted train step.

    ``loss_fn(params, batch_stats, batch) -> (loss, metrics)`` must be pure.
    With a mesh, the returned step expects the batch pre-sharded over
    ``data`` and keeps state shardings fixed across steps (stable layouts =
    no resharding traffic between steps).
    """

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=state.batch_stats,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
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
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.sgd(learning_rate, momentum=momentum))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.masked(tx, frozen_mask)
    return tx
