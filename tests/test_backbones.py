import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.backbones import (
    MobileNet,
    MobileNetV2,
    ShuffleNet,
    ShuffleNetV2,
    VGG,
)
from torch_detection_tpu.utils import BACKBONES


def run(m, hw=32, batch=1):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, hw, hw, 3)), jnp.float32)
    vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    return m.apply(vars_, x), vars_


class TestVGG:
    def test_registered(self):
        for name in ["VGG", "MobileNet", "MobileNetV2", "ShuffleNet", "ShuffleNetV2"]:
            assert name in BACKBONES

    def test_vgg16_shapes(self):
        outs, _ = run(VGG(depth=16), hw=32)
        assert len(outs) == 5
        # widths: 64,128,256,512,512 (min rule); strides 2,4,8,16,32
        assert [o.shape[-1] for o in outs] == [64, 128, 256, 512, 512]
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]

    def test_vgg11_partial(self):
        outs, _ = run(VGG(depth=11, num_stages=3, out_indices=(2,)), hw=32)
        assert len(outs) == 1 and outs[0].shape[-1] == 256


class TestMobileNet:
    def test_v1_shapes(self):
        outs, _ = run(MobileNet(width_multi=0.5), hw=64)
        assert [o.shape[-1] for o in outs] == [32, 64, 128, 256, 512]
        assert outs[0].shape[1] == 32 and outs[-1].shape[1] == 2

    def test_v1_width_multi(self):
        outs, _ = run(MobileNet(width_multi=0.25, num_stages=2, out_indices=(1,)), hw=32)
        assert outs[0].shape[-1] == 32

    def test_v2_shapes(self):
        outs, _ = run(MobileNetV2(), hw=64)
        assert [o.shape[-1] for o in outs] == [16, 24, 32, 64, 96, 160, 320]
        # strides: 2 (stem), then 1,2,2,2,1,2,1
        assert outs[-1].shape[1] == 2

    def test_v2_last_conv(self):
        outs, _ = run(MobileNetV2(num_stages=7, out_indices=(6,), with_last_conv=True), hw=32)
        assert outs[0].shape[-1] == 1280

    def test_v2_residual_grad_flow(self):
        m = MobileNetV2(num_stages=2, out_indices=(1,))
        x = jnp.ones((1, 32, 32, 3))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        # blocks with equal in/out and stride 1 must have residual adds:
        # check output varies smoothly with input (jacobian nonzero)
        g = jax.grad(lambda x: jnp.sum(m.apply(vars_, x)[0] ** 2))(x)
        assert float(jnp.abs(g).sum()) > 0


class TestShuffleNet:
    def test_v1_shapes(self):
        outs, _ = run(ShuffleNet(groups=3), hw=64)
        assert [o.shape[-1] for o in outs] == [240, 480, 960]
        # stem s2 + maxpool s2 + per-stage s2 -> strides 8, 16, 32
        assert [o.shape[1] for o in outs] == [8, 4, 2]

    def test_v1_groups(self):
        outs, _ = run(ShuffleNet(groups=2, num_stages=1, out_indices=(0,)), hw=32)
        assert outs[0].shape[-1] == 200

    def test_v2_shapes(self):
        outs, _ = run(ShuffleNetV2(width_mult=1.0), hw=64)
        # final stage passes through conv5 -> 1024
        assert [o.shape[-1] for o in outs] == [116, 232, 1024]

    def test_v2_widths(self):
        outs, _ = run(
            ShuffleNetV2(width_mult=0.5, num_stages=2, out_indices=(0, 1), with_last_conv=False),
            hw=32,
        )
        assert [o.shape[-1] for o in outs] == [48, 96]

    def test_v2_no_last_conv(self):
        outs, _ = run(ShuffleNetV2(width_mult=1.0, with_last_conv=False), hw=64)
        assert outs[-1].shape[-1] == 464

    def test_frozen_stages(self):
        m = ShuffleNetV2(width_mult=0.5, num_stages=2, out_indices=(1,), frozen_stages=1)
        x = jnp.ones((1, 32, 32, 3))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(m.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)[0] ** 2)

        grads = jax.grad(loss)(vars_["params"])
        s2 = jax.tree_util.tree_reduce(lambda a, g: a + jnp.abs(g).sum(), grads["stage2_0"], 0.0)
        s3 = jax.tree_util.tree_reduce(lambda a, g: a + jnp.abs(g).sum(), grads["stage3_0"], 0.0)
        assert float(s2) == 0.0 and float(s3) > 0.0


class TestRemat:
    def test_remat_matches_plain(self):
        import jax
        import jax.numpy as jnp
        from torch_detection_tpu.models.backbones import ResNet

        x = jnp.ones((1, 32, 32, 3))
        plain = ResNet(depth=18, num_stages=2, out_indices=(1,))
        remat = ResNet(depth=18, num_stages=2, out_indices=(1,), remat=True)
        vars_ = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
        out_p = plain.apply(vars_, x)[0]
        out_r = remat.apply(vars_, x)[0]
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r), rtol=1e-6)

        def loss(m):
            def f(params):
                return jnp.sum(m.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)[0] ** 2)
            return jax.grad(f)(vars_["params"])

        g_p = loss(plain)
        g_r = loss(remat)
        a = jax.tree_util.tree_leaves(jax.tree_util.tree_map(lambda p, q: np.abs(np.asarray(p) - np.asarray(q)).max(), g_p, g_r))
        assert max(a) < 1e-5


class TestMobileNetV2TorchParity:
    def test_torchvision_import_matches(self):
        import torch

        import jax
        import jax.numpy as jnp

        from torch_refs import TorchMobileNetV2, randomize_bn_stats
        from torch_detection_tpu.models.backbones import MobileNetV2
        from torch_detection_tpu.models.torch_import import (
            load_torch_weights,
            mobilenetv2_key_rules,
        )

        torch.manual_seed(7)
        tm = TorchMobileNetV2()
        randomize_bn_stats(tm, seed=7)
        tm.eval()

        jm = MobileNetV2(out_indices=(2, 4, 6), norm_cfg={"type": "FrozenBN"})
        x = np.random.default_rng(8).normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
        variables = jax.jit(jm.init)(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = load_torch_weights(
            variables, tm.state_dict(), key_rules=mobilenetv2_key_rules(with_last_conv=False), strict=True
        )
        with torch.no_grad():
            want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        got = jax.jit(jm.apply)(variables, jnp.asarray(x))
        assert len(got) == 3
        for lvl in range(3):
            np.testing.assert_allclose(
                np.asarray(got[lvl]),
                want[lvl].numpy().transpose(0, 2, 3, 1),
                atol=1e-4, rtol=1e-4, err_msg=f"level {lvl}",
            )


class TestS2DStem:
    """stem_s2d: folded 4x4 stem == canonical 7x7 stem, same param tree."""

    def test_equivalence_and_param_tree(self, rng):
        import jax

        from torch_detection_tpu.models.backbones.resnet import ResNet

        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
        m0 = ResNet(depth=18, num_stages=2, out_indices=(0, 1))
        m1 = ResNet(depth=18, num_stages=2, out_indices=(0, 1), stem_s2d=True)
        v0 = jax.jit(m0.init)(jax.random.PRNGKey(0), x)
        v1 = jax.jit(m1.init)(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
        # same params -> same features, via both input layouts
        from torch_detection_tpu.models.backbones.resnet import space_to_depth_2x2

        for inp in (x, space_to_depth_2x2(x)):
            for a, b in zip(m0.apply(v0, x), m1.apply(v0, inp)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
                )

    def test_gradients_flow(self, rng):
        import jax

        from torch_detection_tpu.models.backbones.resnet import ResNet

        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        m = ResNet(depth=18, num_stages=1, out_indices=(0,), stem_s2d=True)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(params):
            (out,) = m.apply({"params": params, "batch_stats": v.get("batch_stats", {})}, x)
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(v["params"])
        stem_g = np.asarray(g["stem"]["conv"]["kernel"])
        assert stem_g.shape == (7, 7, 3, 64)
        assert np.abs(stem_g).max() > 0
