"""SSD family: anchors, trunk geometry, OHEM loss, decode, config wiring.

Covers ``models/backbones/ssd_vgg.py``, ``models/heads/ssd_head.py`` and
``models/detectors/ssd.py`` — the classic consumer of the reference's VGG
backbone (``models/backbone/vgg.py`` in TCGGroup/Torch_Detection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.builder import build_detection_cfg, build_detector, build_loss_fn
from torch_detection_tpu.models.detectors import SSDConfig, decode_ssd, ssd_loss
from torch_detection_tpu.ops.anchors import SSDAnchorGenerator


class TestSSDAnchors:
    def test_ssd300_canonical_count(self):
        g = SSDAnchorGenerator()
        fs = g.featmap_sizes_for((300, 300))
        assert fs == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
        assert g.num_base_anchors_per_level == (4, 6, 6, 6, 4, 4)
        total = sum(h * w * a for (h, w), a in zip(fs, g.num_base_anchors_per_level))
        assert total == 8732  # the canonical SSD300 anchor count

    def test_base_anchor_geometry(self):
        g = SSDAnchorGenerator()
        b = np.asarray(g.base_anchors_for_level(0))  # min 21, max 45, ratios (2,)
        w = b[:, 2] - b[:, 0]
        h = b[:, 3] - b[:, 1]
        np.testing.assert_allclose(w[0], 21.0, rtol=1e-6)  # min square
        np.testing.assert_allclose(w[1], np.sqrt(21.0 * 45.0), rtol=1e-6)
        np.testing.assert_allclose(w[2] / h[2], 2.0, rtol=1e-5)  # ratio 2
        np.testing.assert_allclose(w[3] / h[3], 0.5, rtol=1e-5)  # ratio 1/2
        # centered on (stride/2, stride/2)
        np.testing.assert_allclose((b[:, 0] + b[:, 2]) / 2, 4.0, atol=1e-5)


def _tiny_ssd(num_classes=4):
    # real SSDVGG trunk + SSDHead at 300x300 with a small class count —
    # heavy-ish on 1 CPU core but it exercises the genuine geometry
    model = build_detector(dict(
        type="SingleStageDetector",
        backbone=dict(type="SSDVGG", depth=16),
        neck=None,
        head=dict(
            type="SSDHead", num_classes=num_classes,
            in_channels=(512, 1024, 512, 256, 256, 256),
            anchors_per_level=(4, 6, 6, 6, 4, 4),
        ),
    ))
    cfg = SSDConfig(
        num_classes=num_classes,
        anchor_generator=SSDAnchorGenerator(
            strides=(8, 16, 32, 64, 100, 300),
            min_sizes=(21.0, 45.0, 99.0, 153.0, 207.0, 261.0),
            max_sizes=(45.0, 99.0, 153.0, 207.0, 261.0, 315.0),
        ),
        max_detections=10,
        pre_nms_top_k=100,
    )
    return model, cfg


@pytest.fixture(scope="module")
def ssd_setup():
    model, cfg = _tiny_ssd()
    x = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, cfg, variables


class TestSSDForward:
    def test_head_shapes(self, ssd_setup, rng):
        model, cfg, variables = ssd_setup
        x = jnp.asarray(rng.normal(size=(1, 300, 300, 3)), jnp.float32)
        cls, reg = model.apply(variables, x)
        assert len(cls) == 6 and len(reg) == 6
        assert cls[0].shape == (1, 38, 38, 4 * 5)  # 4 anchors x (4 fg + bg)
        assert cls[1].shape == (1, 19, 19, 6 * 5)
        assert reg[5].shape == (1, 1, 1, 4 * 4)

    def test_loss_and_grads(self, ssd_setup, rng):
        model, cfg, variables = ssd_setup
        x = jnp.asarray(rng.normal(size=(1, 300, 300, 3)), jnp.float32)
        gt_boxes = jnp.array([[[30.0, 30.0, 120.0, 140.0], [0, 0, 0, 0]]])
        gt_labels = jnp.array([[2, 0]], jnp.int32)
        gt_valid = jnp.array([[True, False]])

        def loss_fn(params):
            cls, reg = model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}}, x)
            losses = ssd_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        assert float(aux["num_pos"]) > 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert float(gnorm) > 0

    def test_ohem_caps_negatives(self, rng):
        # hand-check the 3:1 mining with a synthetic single-level setup
        cfg = SSDConfig(
            num_classes=2,
            anchor_generator=SSDAnchorGenerator(
                strides=(8,), min_sizes=(16.0,), max_sizes=(32.0,), ratios=((2.0,),),
            ),
        )
        h = w = 4
        n = h * w * 4
        cls = [jnp.asarray(rng.normal(size=(1, h, w, 4 * 3)).astype(np.float32))]
        reg = [jnp.zeros((1, h, w, 4 * 4), jnp.float32)]
        gt_boxes = jnp.array([[[4.0, 4.0, 22.0, 22.0]]])
        gt_labels = jnp.array([[1]], jnp.int32)
        gt_valid = jnp.array([[True]])
        losses = ssd_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)
        assert np.isfinite(float(losses["loss"]))
        num_pos = float(losses["num_pos"])
        assert num_pos >= 1
        # direct check of the mask logic: count selected negatives
        from torch_detection_tpu.models.detectors.ssd import _flatten_ssd_outputs

        anchors = cfg.anchor_generator.flat_anchors([(h, w)])
        flat_c, _ = _flatten_ssd_outputs(cfg, cls, reg)
        assign = cfg.assigner(anchors, gt_boxes[0], gt_valid[0], gt_labels[0])
        pos = np.asarray(assign.assigned_gt_inds > 0)
        assert pos.sum() == num_pos
        # negatives kept must be exactly min(3*num_pos, num_neg)
        neg = np.asarray(assign.assigned_gt_inds == 0)
        expect = min(int(3 * num_pos), int(neg.sum()))
        # reproduce the kept-negative count from the loss internals
        logp = jax.nn.log_softmax(flat_c[0], axis=-1)
        cls_t = np.where(pos, np.asarray(assign.labels), 0)
        ce = -np.take_along_axis(np.asarray(logp), cls_t[:, None], axis=-1)[:, 0]
        neg_rank = np.full(n, n)
        order = np.argsort(-np.where(neg, ce, -np.inf))
        neg_rank[order] = np.arange(n)
        assert int((neg & (neg_rank < 3 * pos.sum())).sum()) == expect

    def test_decode_shapes(self, ssd_setup, rng):
        model, cfg, variables = ssd_setup
        x = jnp.asarray(rng.normal(size=(1, 300, 300, 3)), jnp.float32)
        cls, reg = model.apply(variables, x)
        dets = decode_ssd(
            cfg, cls, reg,
            img_shapes=jnp.array([[300, 225]], jnp.float32),
            scale_factors=jnp.array([0.5]),
        )
        assert dets.boxes.shape == (1, 10, 4)
        v = np.asarray(dets.valid)
        assert np.isfinite(np.asarray(dets.boxes)[v]).all()
        lab = np.asarray(dets.labels)
        assert ((lab[v] >= 0) & (lab[v] < 4)).all()

    def test_config_roundtrip(self):
        import importlib.util, pathlib

        path = pathlib.Path("configs/ssd300_vgg16_coco.py")
        from torch_detection_tpu.utils import Config

        cfg = Config.fromfile(str(path))
        det_cfg = build_detection_cfg(cfg["detection"])
        assert isinstance(det_cfg, SSDConfig)
        assert det_cfg.anchor_generator.num_base_anchors_per_level == (4, 6, 6, 6, 4, 4)
        model = build_detector(cfg["model"], "float32")
        loss_fn = build_loss_fn(model, det_cfg)
        assert callable(loss_fn)

    def test_ssd512_geometry(self):
        from torch_detection_tpu.models.backbones import SSDVGG
        from torch_detection_tpu.utils import Config

        cfg = Config.fromfile("configs/ssd512_vgg16_coco.py")
        det_cfg = build_detection_cfg(cfg["detection"])
        fs = det_cfg.anchor_generator.featmap_sizes_for((512, 512))
        assert fs == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        total = sum(
            h * w * a
            for (h, w), a in zip(fs, det_cfg.anchor_generator.num_base_anchors_per_level)
        )
        assert total == 24564  # canonical SSD512 anchor count
        # the 512 trunk emits the matching 7-level ladder
        m = SSDVGG(input_size=512)
        x = jnp.zeros((1, 512, 512, 3), jnp.float32)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert [o.shape[1:3] for o in outs] == fs


class TestSSDVGGParity:
    def test_trunk_matches_torch(self, rng):
        import torch

        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import torch_refs
        from torch_detection_tpu.models.backbones import SSDVGG
        from torch_detection_tpu.models.torch_import import (
            load_torch_weights,
            ssd_vgg_key_rules,
        )

        tm = torch_refs.TorchSSDVGG().eval()
        x = rng.normal(size=(1, 3, 300, 300)).astype(np.float32) * 0.1
        with torch.no_grad():
            t_outs = tm(torch.from_numpy(x))

        m = SSDVGG()
        jx = jnp.asarray(x.transpose(0, 2, 3, 1))
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), jx)
        vars_ = load_torch_weights(
            vars_, tm.state_dict(), key_rules=ssd_vgg_key_rules(), strict=True
        )
        j_outs = m.apply(jax.tree_util.tree_map(jnp.asarray, vars_), jx)

        assert len(t_outs) == len(j_outs) == 6
        for lvl, (t, j) in enumerate(zip(t_outs, j_outs)):
            want = t.numpy().transpose(0, 2, 3, 1)
            got = np.asarray(j)
            assert got.shape == want.shape, (lvl, got.shape, want.shape)
            err = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
            assert err < 5e-3, f"level {lvl} normalized error {err}"
