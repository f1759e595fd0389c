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
    """Minimal functional train state (pytree).

    ``ema_params`` is None unless the step was built with ``ema_decay`` —
    None flattens to an empty subtree, so EMA-less states keep their old
    checkpoint/sharding structure."""

    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None
    ema_params: Any = None

    def tree_flatten(self):
        return (
            self.step, self.params, self.opt_state, self.batch_stats,
            self.ema_params,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def create_train_state(
    params,
    tx: optax.GradientTransformation,
    batch_stats=None,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
    )


def make_train_step(
    loss_fn: Callable[[Any, Any, Dict[str, jax.Array]], Tuple[jax.Array, Dict]],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate_state: bool = True,
    skip_nonfinite: bool = True,
    accum_steps: int = 1,
    ema_decay: Optional[float] = None,
    fsdp: bool = False,
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

    ``accum_steps > 1`` is the HBM-vs-batch knob: the incoming batch (whose
    leading axis must be divisible by ``accum_steps``) is split into that
    many microbatches and grads are averaged through a ``lax.scan`` — peak
    activation memory is one microbatch's, the update sees the full batch.
    One optimizer step per call either way (the LR schedule indexes optimizer
    steps, not microbatches).

    ``fsdp=True`` (requires a mesh) applies the ZeRO-3 sharding rule to
    params, optimizer state, and EMA: large leaves are sharded 1/N over the
    ``data`` axis between steps, all-gathered by GSPMD at their use sites,
    and their gradients reduce-scattered.  Numerics are identical to plain
    DP (same reduction tree modulo GSPMD reassociation); per-chip state
    memory drops ~Nx — the knob that fits optimizer state for big backbones
    on small chips.  Shard the inputs with ``shard_params(mesh, params,
    fsdp=True)`` so ``tx.init`` inherits the layout and step 0 does not
    reshard.

    ``ema_decay`` (e.g. 0.999) keeps an exponential moving average of the
    params in ``state.ema_params`` with the standard warmup ramp
    ``min(decay, (1+t)/(10+t))`` — evaluate/serve the EMA weights for the
    usual late-training stability win.  Free on-chip (one fma per param).
    """

    import inspect

    loss_wants_step = "step" in inspect.signature(loss_fn).parameters

    def grads_of(state: TrainState, batch):
        if loss_wants_step:
            bound = partial(loss_fn, step=state.step)
        else:
            bound = loss_fn
        return jax.value_and_grad(bound, has_aux=True)(
            state.params, state.batch_stats, batch
        )

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        if accum_steps > 1:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (accum_steps, x.shape[0] // accum_steps) + x.shape[1:]
                ),
                batch,
            )
            mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
            (loss0, metrics0), grads0 = grads_of(state, mb0)

            def body(carry, mb):
                loss_a, metrics_a, grads_a = carry
                (l, m), g = grads_of(state, mb)
                add = lambda a, b: a + b
                return (
                    loss_a + l,
                    jax.tree_util.tree_map(add, metrics_a, m),
                    jax.tree_util.tree_map(add, grads_a, g),
                ), None

            rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
            (loss, metrics, grads), _ = jax.lax.scan(
                body, (loss0, metrics0, grads0), rest
            )
            inv = 1.0 / accum_steps
            loss = loss * inv
            metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics)
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        else:
            (loss, metrics), grads = grads_of(state, batch)
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
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(jnp.float32(ema_decay), (1.0 + t) / (10.0 + t))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
                state.ema_params, new_params,
            )
            if skip_nonfinite:
                new_ema = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(ok, new, old),
                    new_ema, state.ema_params,
                )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=state.batch_stats,
            ema_params=new_ema,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        if skip_nonfinite:
            metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())

    def sharded_compile(state_example):
        ps = param_shardings(mesh, state_example.params, fsdp=fsdp)
        os_ = param_shardings(mesh, state_example.opt_state, fsdp=fsdp)
        bs = (
            # batch_stats are per-channel vectors — always replicated
            param_shardings(mesh, state_example.batch_stats)
            if state_example.batch_stats is not None
            else None
        )
        es = (
            param_shardings(mesh, state_example.ema_params, fsdp=fsdp)
            if state_example.ema_params is not None
            else None
        )
        state_sh = TrainState(replicated(mesh), ps, os_, bs, es)
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
    kind: str = "sgd",
) -> optax.GradientTransformation:
    """SGD+momentum+WD (the detection default) or AdamW (``kind="adamw"`` —
    the transformer-family default, e.g. DETR), with optional global-norm
    clipping and a freeze mask (True = train, False = frozen — the TPU
    analog of the reference's ``bn_frozen`` / ``frozen_stages`` flags)."""
    assert kind in ("sgd", "adamw")
    chain = []
    if frozen_mask is not None:
        # zero frozen grads FIRST (optax.masked alone would pass the raw
        # gradient through as the update for unmasked leaves)
        inverted = jax.tree_util.tree_map(lambda m: not m, frozen_mask)
        chain.append(optax.masked(optax.set_to_zero(), inverted))
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if kind == "adamw":
        chain.append(
            optax.adamw(
                learning_rate, weight_decay=weight_decay,
                mask=frozen_mask if frozen_mask is not None else None,
            )
        )
    else:
        decay = optax.add_decayed_weights(weight_decay)
        if frozen_mask is not None:
            decay = optax.masked(decay, frozen_mask)  # no decay drift on frozen params
        chain.append(decay)
        chain.append(optax.sgd(learning_rate, momentum=momentum))
    return optax.chain(*chain)
