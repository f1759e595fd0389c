"""EMA params + microbatch gradient accumulation (parallel/train_step.py).

The reference has no trainer at all (SURVEY.md §2 #33 [ABSENT]); these are
training-tier capabilities its mmdetection lineage implies.  Everything here
runs on simple quadratic losses where the accumulation identity is exact:
grads of a per-sample-mean loss averaged over microbatches == grads over the
full batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu.parallel import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_params,
)


def _quadratic_loss(params, batch_stats, batch):
    pred = batch["x"] @ params["w"] + params["b"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {"mse": loss}


def _toy(n=8, d=4, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w": jnp.asarray(rng.normal(size=(d, 1)), jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }
    batch = {
        "x": jnp.asarray(rng.normal(size=(n, d)), jnp.float32),
        "y": jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
    }
    return params, batch


def test_grad_accum_matches_full_batch():
    params, batch = _toy()
    tx = optax.sgd(0.1, momentum=0.9)

    s_full = create_train_state(params, tx)
    s_acc = create_train_state(params, tx)
    step_full = make_train_step(_quadratic_loss, tx, donate_state=False)
    step_acc = make_train_step(
        _quadratic_loss, tx, donate_state=False, accum_steps=4
    )

    for _ in range(3):
        s_full, m_full = step_full(s_full, batch)
        s_acc, m_acc = step_acc(s_acc, batch)

    np.testing.assert_allclose(
        np.asarray(s_acc.params["w"]), np.asarray(s_full.params["w"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_acc["mse"]), float(m_full["mse"]), rtol=1e-5)
    assert int(s_acc.step) == 3  # one optimizer step per call, not per microbatch


def test_grad_accum_requires_divisible_batch():
    params, batch = _toy(n=6)
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx)
    step = make_train_step(_quadratic_loss, tx, donate_state=False, accum_steps=4)
    with pytest.raises(Exception):  # 6 % 4 != 0 -> reshape error at trace
        step(state, batch)


def test_ema_tracks_params_with_warmup_ramp():
    params, batch = _toy()
    tx = optax.sgd(0.1)
    decay = 0.9
    state = create_train_state(params, tx, ema=True)
    step = make_train_step(_quadratic_loss, tx, donate_state=False, ema_decay=decay)

    # manual recursion with the min(decay, (1+t)/(10+t)) ramp
    ref_ema = np.asarray(params["w"])
    cur = state
    for t in range(5):
        prev_w = np.asarray(cur.params["w"])
        cur, _ = step(cur, batch)
        d = min(decay, (1.0 + t) / (10.0 + t))
        ref_ema = d * ref_ema + (1.0 - d) * np.asarray(cur.params["w"])

    np.testing.assert_allclose(np.asarray(cur.ema_params["w"]), ref_ema, rtol=1e-5)
    # ema must lag the raw params, not mirror them
    assert not np.allclose(np.asarray(cur.ema_params["w"]), np.asarray(cur.params["w"]))


def test_ema_none_without_flag():
    params, batch = _toy()
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx)
    assert state.ema_params is None
    step = make_train_step(_quadratic_loss, tx, donate_state=False)
    state, _ = step(state, batch)
    assert state.ema_params is None


def test_ema_frozen_on_nonfinite_step():
    params, batch = _toy()
    tx = optax.sgd(0.1)
    state = create_train_state(params, tx, ema=True)
    step = make_train_step(_quadratic_loss, tx, donate_state=False, ema_decay=0.9)
    state, _ = step(state, batch)  # one clean step so ema != init

    bad = dict(batch, y=batch["y"].at[0, 0].set(jnp.nan))
    before = np.asarray(state.ema_params["w"])
    state, metrics = step(state, bad)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(np.asarray(state.ema_params["w"]), before)


def test_accum_and_ema_under_mesh():
    """Sharded step with both knobs: compiles under GSPMD and matches the
    unsharded result (the sharding-structure analog of the multihost tests)."""
    params, batch = _toy(n=8)
    tx = optax.sgd(0.1, momentum=0.9)

    s1 = create_train_state(params, tx, ema=True)
    step1 = make_train_step(
        _quadratic_loss, tx, donate_state=False, accum_steps=2, ema_decay=0.99
    )
    s1, _ = step1(s1, batch)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sp = shard_params(mesh, params)
        s2 = create_train_state(sp, tx, ema=True)
        step2 = make_train_step(
            _quadratic_loss, tx, mesh=mesh, donate_state=False,
            accum_steps=2, ema_decay=0.99,
        )(s2)
        s2, _ = step2(s2, shard_batch(mesh, batch))

    np.testing.assert_allclose(
        np.asarray(s2.params["w"]), np.asarray(s1.params["w"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s2.ema_params["w"]), np.asarray(s1.ema_params["w"]), rtol=1e-5
    )


def test_trainer_metrics_jsonl(tmp_path):
    """The Trainer persists a machine-readable training curve to
    work_dir/metrics.jsonl: one JSON object per logged window with loss,
    images_per_sec, lr, skipped_steps, epoch, step (VERDICT r3 weak #6)."""
    import json

    from torch_detection_tpu.engine import Trainer

    class _Loader:
        """4 identical toy batches per epoch with an 'image' key for the
        trainer's img/s accounting."""

        def __init__(self, batch):
            self.batch = dict(batch, image=np.zeros((int(batch["x"].shape[0]), 1, 1, 3)))

        def set_epoch(self, epoch):
            pass

        def __len__(self):
            return 4

        def iter_batches(self, skip=0):
            for _ in range(skip, 4):
                yield dict(self.batch)

    params, batch = _toy(n=8)
    sched = optax.constant_schedule(0.05)
    tx = optax.sgd(sched)
    trainer = Trainer(
        _quadratic_loss, {"params": params}, tx, _Loader(batch),
        work_dir=str(tmp_path / "work"), log_interval=2,
        checkpoint_interval_epochs=99, lr_schedule=sched,
    )
    trainer.run(num_epochs=2)

    path = tmp_path / "work" / "metrics.jsonl"
    assert path.exists()
    records = [json.loads(l) for l in path.read_text().splitlines() if l.strip()]
    assert len(records) == 4  # 8 steps / log_interval 2
    for r in records:
        for key in ("loss", "images_per_sec", "lr", "skipped_steps", "epoch", "step"):
            assert key in r, r
        assert r["lr"] == pytest.approx(0.05)
        assert r["skipped_steps"] == 0
        assert np.isfinite(r["loss"])
    assert [r["step"] for r in records] == [2, 4, 6, 8]
