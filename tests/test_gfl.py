"""GFL family: integral decode, quality/distribution focal losses, export.

Covers ``models/heads/gfl_head.py`` and ``models/detectors/gfl.py`` — the
eleventh detector family; the reference has no detector tier at all
(SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    GFLConfig,
    SingleStageDetector,
    decode_gfl,
    gfl_loss,
    integral,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator


def tiny_gfl(num_classes=4, reg_max=8):
    return SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(
            type="GFLHead", num_classes=num_classes, in_channels=32,
            feat_channels=32, stacked_convs=1, reg_max=reg_max,
        ),
    )


def tiny_cfg(**kw):
    kw.setdefault("num_classes", 4)
    kw.setdefault("reg_max", 8)
    kw.setdefault(
        "anchor_generator",
        AnchorGenerator(strides=(8, 16, 32, 64, 128), ratios=(1.0,),
                        octave_base_scale=8.0, scales_per_octave=1),
    )
    return GFLConfig(**kw)


@pytest.fixture(scope="module")
def gfl_setup():
    m = tiny_gfl()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


def test_integral_matches_numpy():
    rng = np.random.default_rng(5)
    for reg_max in (8, 16):
        n1 = reg_max + 1
        logits = rng.normal(size=(7, 4 * n1)).astype(np.float32)
        got = np.asarray(integral(jnp.asarray(logits), reg_max))
        p = logits.reshape(7, 4, n1)
        p = np.exp(p - p.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        want = (p * np.arange(n1)).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        assert (got >= 0).all() and (got <= reg_max).all()


class TestGFLDetector:
    def test_forward_shapes(self, gfl_setup, rng):
        m, vars_ = gfl_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg = m.apply(vars_, x)
        assert len(cls) == len(reg) == 5
        assert cls[0].shape == (2, 8, 8, 4)
        assert reg[0].shape == (2, 8, 8, 4 * 9)

    def test_loss_and_grads(self, gfl_setup, rng):
        m, vars_ = gfl_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        )
        gt_labels = jnp.array([[1, 0], [2, 3]], jnp.int32)
        gt_valid = jnp.array([[True, False], [True, True]])

        def loss_fn(params):
            cls, reg = m.apply(
                {"params": params, **{k: v for k, v in vars_.items() if k != "params"}}, x
            )
            losses = gfl_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        assert float(aux["num_pos"]) > 0
        for k in ("loss_qfl", "loss_giou", "loss_dfl"):
            assert np.isfinite(float(aux[k])) and float(aux[k]) >= 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert float(gnorm) > 0
        assert float(jnp.sum(jnp.abs(grads["head"]["scales"]))) > 0

    def test_overfit_one_batch(self, rng):
        """A few SGD steps on one fixed batch must drive every loss term
        down — end-to-end sanity that QFL/DFL/GIoU gradients cooperate."""
        m = tiny_gfl()
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array([[[8.0, 8.0, 40.0, 36.0]]])
        gt_labels = jnp.array([[2]], jnp.int32)
        gt_valid = jnp.array([[True]])
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(1), x)
        tx = optax.sgd(0.01, momentum=0.9)
        params = vars_["params"]
        rest = {k: v for k, v in vars_.items() if k != "params"}
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                cls, reg = m.apply({"params": p, **rest}, x)
                return gfl_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)["loss"]

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt2, loss

        first = None
        for i in range(25):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.7 * first

    def test_decode_shapes_and_validity(self, gfl_setup, rng):
        m, vars_ = gfl_setup
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64, score_thr=0.0)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg = m.apply(vars_, x)
        dets = decode_gfl(
            cfg, cls, reg,
            img_shapes=jnp.array([[60, 64], [64, 64]], jnp.float32),
            scale_factors=jnp.array([2.0, 1.0]),
        )
        assert dets.boxes.shape == (2, 10, 4)
        v = np.asarray(dets.valid)
        assert v.sum() > 0
        bx = np.asarray(dets.boxes)[v]
        assert np.isfinite(bx).all()
        assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()
        lab = np.asarray(dets.labels)
        assert ((lab[v] >= 0) & (lab[v] < 4)).all()

    def test_decode_box_geometry(self):
        """With a delta-peaked distribution the decoded box must sit exactly
        at center ± bin*stride (numpy-checkable geometry)."""
        cfg = tiny_cfg(pre_select_per_level=10**9, score_thr=0.0,
                       pre_nms_top_k=16, max_detections=4)
        sizes = [(2, 2), (1, 1), (1, 1), (1, 1), (1, 1)]
        n1 = cfg.reg_max + 1
        # one level-0 location scored high; its ltrb distribution peaks at
        # bins (2, 1, 3, 2) -> distances (16, 8, 24, 16) px at stride 8
        cls = [jnp.full((1, h, w, 4), -20.0, jnp.float32) for h, w in sizes]
        reg = [jnp.zeros((1, h, w, 4 * n1), jnp.float32) for h, w in sizes]
        cls[0] = cls[0].at[0, 0, 0, 1].set(8.0)
        peak = np.zeros((4, n1), np.float32)
        for side, b in enumerate((2, 1, 3, 2)):
            peak[side, b] = 60.0  # softmax -> delta
        reg[0] = reg[0].at[0, 0, 0, :].set(jnp.asarray(peak.reshape(-1)))
        dets = decode_gfl(cfg, cls, reg)
        v = np.asarray(dets.valid)[0]
        assert v[0]
        anc = np.asarray(cfg.anchor_generator.grid_anchors(sizes)[0][0])
        cx, cy = (anc[0] + anc[2]) / 2, (anc[1] + anc[3]) / 2
        want = [cx - 16.0, cy - 8.0, cx + 24.0, cy + 16.0]
        np.testing.assert_allclose(np.asarray(dets.boxes)[0, 0], want, atol=1e-3)
        assert int(np.asarray(dets.labels)[0, 0]) == 1

    def test_config_build_and_loss_fn(self):
        from torch_detection_tpu.builder import build_detection_cfg
        from torch_detection_tpu.utils import Config

        cfg_file = Config.fromfile("configs/gfl_r50_fpn_coco.py")
        det = build_detection_cfg(cfg_file["detection"])
        assert isinstance(det, GFLConfig)
        assert det.anchor_generator.num_base_anchors == 1
        assert det.assigner.topk == 9
        assert det.reg_max == 16 and det.dfl_weight == 0.25

    def test_export_roundtrip(self, tmp_path, rng):
        import os

        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )

        m = tiny_gfl()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64, score_thr=0.0)
        exported = export_serving(m, cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "gfl.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 10, 4)
        assert np.asarray(served["valid"]).sum() > 0

    def test_decode_jits(self, gfl_setup, rng):
        m, vars_ = gfl_setup
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64)

        @jax.jit
        def infer(vars_, x):
            cls, reg = m.apply(vars_, x)
            return decode_gfl(cfg, cls, reg)

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        dets = infer(vars_, x)
        assert dets.boxes.shape == (1, 10, 4)
