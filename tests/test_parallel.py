"""Mesh / sharded-train-step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu.parallel import (
    TrainState,
    batch_sharding,
    create_train_state,
    make_mesh,
    make_optimizer,
    make_train_step,
    param_sharding_rules,
    shard_batch,
    shard_params,
)


def simple_loss(params, batch_stats, batch):
    pred = batch["x"] @ params["w"] + params["b"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {"mse": loss}


def make_vars(din=8, dout=4):
    rng = np.random.default_rng(0)
    return {
        "w": jnp.asarray(rng.normal(size=(din, dout)) * 0.1, jnp.float32),
        "b": jnp.zeros((dout,), jnp.float32),
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
        mesh = make_mesh(model=2)
        assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
        with pytest.raises(AssertionError):
            make_mesh(data=3, model=2)

    def test_param_sharding_rules(self):
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(model=2)
        rule = param_sharding_rules(mesh)
        wide = np.zeros((3, 3, 16, 64))
        narrow = np.zeros((7,))
        assert rule(wide).spec == P(None, None, None, "model")
        assert rule(narrow).spec == P()
        # model=1 -> everything replicated
        rule1 = param_sharding_rules(make_mesh(model=1))
        assert rule1(wide).spec == P()

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh()
        batch = {"x": np.ones((8, 4), np.float32)}
        sharded = shard_batch(mesh, batch)
        assert sharded["x"].sharding.spec == batch_sharding(mesh).spec


class TestTrainStep:
    def test_unsharded_step_descends(self):
        params = make_vars()
        tx = optax.sgd(0.1)
        state = create_train_state(params, tx)
        step = make_train_step(simple_loss, tx)
        rng = np.random.default_rng(0)
        batch = {
            "x": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
            "y": jnp.ones((16, 4), jnp.float32),
        }
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_sharded_step_matches_single_device(self):
        tx = optax.sgd(0.1)
        rng = np.random.default_rng(0)
        batch_np = {
            "x": rng.normal(size=(8, 8)).astype(np.float32),
            "y": np.ones((8, 4), np.float32),
        }
        # single-device run
        s1 = create_train_state(make_vars(), tx)
        step1 = make_train_step(simple_loss, tx, donate_state=False)
        s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch_np.items()})

        # 4x2 mesh run
        mesh = make_mesh(data=4, model=2)
        with mesh:
            params = shard_params(mesh, make_vars())
            s2 = create_train_state(params, tx)
            step2 = make_train_step(simple_loss, tx, mesh=mesh, donate_state=False)(s2)
            s2, m2 = step2(s2, shard_batch(mesh, batch_np))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        np.testing.assert_allclose(
            np.asarray(s1.params["w"]), np.asarray(s2.params["w"]), rtol=1e-5
        )

    def test_nonfinite_step_skipped(self):
        params = make_vars()
        tx = optax.sgd(0.1)
        state = create_train_state(params, tx)
        step = make_train_step(simple_loss, tx, donate_state=False)
        bad_batch = {
            "x": jnp.full((4, 8), jnp.nan),
            "y": jnp.ones((4, 4), jnp.float32),
        }
        new_state, metrics = step(state, bad_batch)
        assert float(metrics["skipped_nonfinite"]) == 1.0
        np.testing.assert_array_equal(
            np.asarray(new_state.params["w"]), np.asarray(params["w"])
        )
        assert int(new_state.step) == 1

    def test_nonfinite_step_reverts_params_with_wd_momentum(self):
        # with weight decay + momentum, zeroed grads on a skipped step still
        # produce a non-zero optax update (wd*params + momentum*buf); the
        # step must revert params AND opt_state together
        params = make_vars()
        tx = make_optimizer(learning_rate=0.1, momentum=0.9, weight_decay=1e-2)
        state = create_train_state(params, tx)
        step = make_train_step(simple_loss, tx, donate_state=False)
        good = {"x": jnp.ones((4, 8)), "y": jnp.zeros((4, 4))}
        state, m = step(state, good)  # builds momentum
        assert float(m["skipped_nonfinite"]) == 0.0
        bad = {"x": jnp.full((4, 8), jnp.nan), "y": jnp.ones((4, 4))}
        new_state, metrics = step(state, bad)
        assert float(metrics["skipped_nonfinite"]) == 1.0
        jax.tree_util.tree_map(
            lambda n, o: np.testing.assert_array_equal(np.asarray(n), np.asarray(o)),
            new_state.params, state.params,
        )
        jax.tree_util.tree_map(
            lambda n, o: np.testing.assert_array_equal(np.asarray(n), np.asarray(o)),
            new_state.opt_state, state.opt_state,
        )

    def test_loss_fn_step_kwarg_threaded(self):
        seen = []

        def loss_with_step(params, batch_stats, batch, step=0):
            loss, aux = simple_loss(params, batch_stats, batch)
            return loss + 0.0 * step, {**aux, "step_echo": step}

        tx = optax.sgd(0.1)
        state = create_train_state(make_vars(), tx)
        step_fn = make_train_step(loss_with_step, tx, donate_state=False)
        batch = {"x": jnp.ones((4, 8)), "y": jnp.zeros((4, 4))}
        for expect in (0, 1, 2):
            state, metrics = step_fn(state, batch)
            seen.append(int(metrics["step_echo"]))
        assert seen == [0, 1, 2]

    def test_build_loss_fn_rng_varies_with_step(self):
        # the builder's two-stage loss_fn must accept a step kwarg so the
        # RPN/RCNN sampling rng is folded per step (ADVICE.md round-1 medium)
        import inspect

        from torch_detection_tpu.builder import build_loss_fn
        from torch_detection_tpu.models.detectors import FasterRCNNConfig

        loss_fn = build_loss_fn(model=None, det_cfg=FasterRCNNConfig(num_classes=4))
        assert "step" in inspect.signature(loss_fn).parameters

    def test_frozen_mask_optimizer(self):
        params = make_vars()
        mask = {"w": True, "b": False}
        tx = make_optimizer(learning_rate=0.1, weight_decay=0.0, frozen_mask=mask)
        state = create_train_state(params, tx)
        step = make_train_step(simple_loss, tx, donate_state=False)
        batch = {"x": jnp.ones((4, 8)), "y": jnp.zeros((4, 4))}
        new_state, _ = step(state, batch)
        assert not np.allclose(np.asarray(new_state.params["w"]), np.asarray(params["w"]))
        np.testing.assert_array_equal(np.asarray(new_state.params["b"]), np.asarray(params["b"]))


def test_init_distributed_single_host():
    from torch_detection_tpu.parallel import init_distributed

    info = init_distributed()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert len(info["local_devices"]) >= 1
