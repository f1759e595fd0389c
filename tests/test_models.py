import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models import (
    ConvModule,
    channel_shuffle,
    channel_split,
    load_torch_weights,
    SELayer,
)
from torch_detection_tpu.models.backbones import ResNet, ResNeXt, SEResNet
from torch_detection_tpu.models.layers import (
    FrozenBatchNorm,
    avg_pool_torch,
    max_pool_same_torch,
    resize_nearest,
    resize_nearest_2x,
)
from torch_detection_tpu.models.necks import FPN, PAFPN
from torch_detection_tpu.utils import BACKBONES, NECKS


class TestLayers:
    def test_conv_module_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        m = ConvModule(32, 3, stride=2, padding=1, norm_cfg={"type": "FrozenBN"})
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == (2, 8, 8, 32)
        assert "batch_stats" in vars_

    def test_conv_module_no_bias_with_norm(self, rng):
        x = jnp.ones((1, 4, 4, 2))
        m = ConvModule(4, 1, norm_cfg={"type": "GN", "num_groups": 2})
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        assert "bias" not in vars_["params"]["conv"]
        m2 = ConvModule(4, 1, norm_cfg=None, act=None)
        vars2 = m2.init(jax.random.PRNGKey(0), x)
        assert "bias" in vars2["params"]["conv"]

    def test_group_merged_conv_matches_grouped(self, rng):
        """Block-diagonal merged grouped conv == native grouped conv, and the
        param tree matches nn.Conv's (checkpoint compatibility)."""
        from flax import linen as nn

        from torch_detection_tpu.models.layers import (
            GroupMergedConv,
            merged_group_count,
        )

        # the merge rule: largest divisor of groups with >=128-wide merged
        # input; depthwise and dense untouched
        assert merged_group_count(128, 32) == 1
        assert merged_group_count(256, 32) == 2
        assert merged_group_count(512, 32) == 4
        assert merged_group_count(1024, 32) == 8
        assert merged_group_count(240, 3) == 1
        assert merged_group_count(960, 3) == 3
        assert merged_group_count(64, 64) == 64  # depthwise
        assert merged_group_count(64, 1) == 1

        x = jnp.asarray(rng.normal(size=(2, 9, 11, 256)), jnp.float32)
        ref = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)],
                      feature_group_count=32, use_bias=True)
        vars_ = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
        want = ref.apply(vars_, x)
        for merge in (False, True):
            m = GroupMergedConv(
                features=128, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                groups=32, use_bias=True, merge=merge,
            )
            assert (
                jax.tree_util.tree_structure(jax.jit(m.init)(jax.random.PRNGKey(0), x))
                == jax.tree_util.tree_structure(vars_)
            )
            got = m.apply(vars_, x)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
            )

    def test_frozen_bn_math(self):
        x = jnp.ones((1, 2, 2, 3)) * 4.0
        m = FrozenBatchNorm()
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        stats = {"mean": jnp.array([1.0, 1.0, 1.0]), "var": jnp.array([4.0, 4.0, 4.0])}
        y = m.apply({"params": vars_["params"], "batch_stats": stats}, x)
        np.testing.assert_allclose(np.asarray(y), (4.0 - 1.0) / 2.0, rtol=1e-4)

    def test_channel_shuffle(self):
        # channels [0..5], groups=2 -> interleave: 0,3,1,4,2,5
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 1, 6)
        y = channel_shuffle(x, 2)
        assert y.flatten().tolist() == [0, 3, 1, 4, 2, 5]

    def test_channel_split(self):
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        a, b = channel_split(x)
        assert a.shape[-1] == 4 and b.flatten().tolist() == [4, 5, 6, 7]

    def test_se_layer(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 16)), jnp.float32)
        m = SELayer(16, reduction=4)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == x.shape

    def test_relu6(self):
        from torch_detection_tpu.models import build_act

        f = build_act("relu6")
        assert f(jnp.array(10.0)) == 6.0 and f(jnp.array(-1.0)) == 0.0

    def test_pool_parity_with_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(1, 9, 11, 3)).astype(np.float32)
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        got = max_pool_same_torch(jnp.asarray(x), 3, 2, 1)
        want = F.max_pool2d(tx, 3, 2, 1).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
        got = avg_pool_torch(jnp.asarray(x), 2, 2, 0)
        want = F.avg_pool2d(tx, 2, 2, 0).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    def test_resize_nearest_parity_with_torch(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(1, 5, 7, 2)).astype(np.float32)
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        got = resize_nearest_2x(jnp.asarray(x))
        want = F.interpolate(tx, scale_factor=2, mode="nearest").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want)
        got = resize_nearest(jnp.asarray(x), (13, 9))
        want = F.interpolate(tx, size=(13, 9), mode="nearest").numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want)


class TestResNet:
    def test_registered(self):
        for name in ["ResNet", "ResNeXt", "SEResNet", "SEResNeXt"]:
            assert name in BACKBONES
        for name in ["FPN", "PAFPN"]:
            assert name in NECKS

    def test_resnet18_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        m = ResNet(depth=18)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = m.apply(vars_, x)
        assert len(outs) == 4
        assert [o.shape for o in outs] == [
            (1, 16, 16, 64),
            (1, 8, 8, 128),
            (1, 4, 4, 256),
            (1, 2, 2, 512),
        ]

    def test_resnet50_shapes_out_indices(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        m = ResNet(depth=50, num_stages=2, out_indices=(1,))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = m.apply(vars_, x)
        assert len(outs) == 1 and outs[0].shape == (1, 4, 4, 512)

    def test_frozen_stages_zero_grads(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
        m = ResNet(depth=18, num_stages=2, out_indices=(1,), frozen_stages=1)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)

        def loss(params):
            out = m.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)
            return jnp.sum(out[0] ** 2)

        grads = jax.grad(loss)(vars_["params"])
        stem_grad = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), grads["stem"], 0.0)
        l1_grad = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), grads["layer1_0"], 0.0)
        l2_grad = jax.tree_util.tree_reduce(lambda a, b: a + jnp.abs(b).sum(), grads["layer2_0"], 0.0)
        assert stem_grad == 0.0 and l1_grad == 0.0 and l2_grad > 0.0

    def test_se_resnet_has_se_params(self, rng):
        x = jnp.ones((1, 32, 32, 3))
        m = SEResNet(depth=18, num_stages=1, out_indices=(0,))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        assert "se" in vars_["params"]["layer1_0"]


class TestFPN:
    def _feats(self, rng, channels=(16, 32, 64, 128), base=16):
        return tuple(
            jnp.asarray(rng.normal(size=(1, base // 2**i, base // 2**i, c)), jnp.float32)
            for i, c in enumerate(channels)
        )

    def test_fpn_maxpool_extra(self, rng):
        feats = self._feats(rng)
        m = FPN(in_channels=(16, 32, 64, 128), out_channels=8, num_outs=5)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        outs = m.apply(vars_, feats)
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
        assert all(o.shape[-1] == 8 for o in outs)

    def test_fpn_retina_style(self, rng):
        feats = self._feats(rng, (32, 64, 128), base=16)
        m = FPN(
            in_channels=(32, 64, 128), out_channels=8, num_outs=5,
            start_level=1, add_extra_convs=True, extra_convs_on_inputs=True,
            relu_before_extra_convs=True,
        )
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        outs = m.apply(vars_, feats)
        assert len(outs) == 5
        assert [o.shape[1] for o in outs] == [8, 4, 2, 1, 1]  # 16/2=8 start_level=1

    def test_pafpn(self, rng):
        feats = self._feats(rng)
        m = PAFPN(in_channels=(16, 32, 64, 128), out_channels=8, num_outs=5)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        outs = m.apply(vars_, feats)
        assert len(outs) == 5
        assert "pa_down1" in vars_["params"] and "pa_out3" in vars_["params"]


class TestTorchImport:
    @pytest.mark.parametrize(
        "torch_fn,flax_kwargs",
        [
            ("torch_resnet18", dict(depth=18)),
            pytest.param("torch_resnet50", dict(depth=50), marks=pytest.mark.slow),
            pytest.param(
                "torch_resnext50_32x4d",
                dict(depth=50, groups=32, base_width=4),
                marks=pytest.mark.slow,
            ),
        ],
    )
    def test_resnet_parity(self, rng, torch_fn, flax_kwargs):
        import torch

        import torch_refs

        tmodel = getattr(torch_refs, torch_fn)()
        torch_refs.randomize_bn_stats(tmodel)
        tmodel.eval()

        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            t_outs = tmodel(torch.from_numpy(x))

        m = ResNet(**flax_kwargs) if torch_fn != "torch_resnext50_32x4d" else ResNeXt(depth=50)
        jx = jnp.asarray(x.transpose(0, 2, 3, 1))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), jx)
        vars_ = load_torch_weights(vars_, tmodel.state_dict(), strict=True)
        j_outs = m.apply(jax.tree_util.tree_map(jnp.asarray, vars_), jx)

        assert len(t_outs) == len(j_outs)
        # XLA-CPU and torch-CPU convolutions use different accumulation
        # algorithms (~1e-3 relative per conv); compare with a normalized
        # error criterion instead of elementwise tolerances.
        for t, j in zip(t_outs, j_outs):
            want = t.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(j)
            err = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
            assert err < 5e-3, f"normalized error {err}"


class TestVGGImport:
    def test_vgg16_parity(self, rng):
        import torch

        import torch_refs
        from torch_detection_tpu.models.backbones import VGG
        from torch_detection_tpu.models.torch_import import vgg_key_rules

        tm = torch_refs.TorchVGG(16).eval()
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32) * 0.1
        with torch.no_grad():
            t_outs = tm(torch.from_numpy(x))

        m = VGG(depth=16)
        jx = jnp.asarray(x.transpose(0, 2, 3, 1))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), jx)
        vars_ = load_torch_weights(vars_, tm.state_dict(), key_rules=vgg_key_rules(16), strict=True)
        j_outs = m.apply(jax.tree_util.tree_map(jnp.asarray, vars_), jx)

        assert len(t_outs) == len(j_outs)
        for t, j in zip(t_outs, j_outs):
            want = t.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(j)
            err = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
            assert err < 5e-3, err
