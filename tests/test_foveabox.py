"""FoveaBox (anchor-free fovea-region) family: targets, loss, decode, wiring.

Covers ``models/heads/fovea_head.py`` and ``models/detectors/foveabox.py``
— the thirteenth detector family; the reference has no detector tier at
all (SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.builder import build_detection_cfg, build_loss_fn
from torch_detection_tpu.models.detectors import (
    FoveaConfig,
    SingleStageDetector,
    decode_fovea,
    fovea_loss,
)
from torch_detection_tpu.models.detectors.foveabox import (
    _flat_geometry,
    fovea_targets,
)


def tiny_fovea(num_classes=4):
    return SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(
            type="FoveaHead", num_classes=num_classes, in_channels=32,
            feat_channels=32, stacked_convs=1,
        ),
    )


@pytest.fixture(scope="module")
def fovea_setup():
    m = tiny_fovea()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


FEATS_64 = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]


@pytest.mark.core
class TestFoveaTargets:
    def test_band_routing_and_fovea_region(self):
        cfg = FoveaConfig(num_classes=3)
        points, strides, bases, bands = _flat_geometry(cfg, FEATS_64)
        # sqrt-area 40 -> level-0 band (1, 64) only (level-1 lower edge 32
        # also contains it: overlapping bands assign it there too)
        gt = jnp.array([[8.0, 8.0, 48.0, 48.0]])  # 40x40, center (28, 28)
        labels = jnp.array([2], jnp.int32)
        valid = jnp.array([True])
        label0, tgt = fovea_targets(
            cfg, points, strides, bases, bands, gt, labels, valid
        )
        label0 = np.asarray(label0)
        p = np.asarray(points)
        # fovea half-width = 0.5*0.4*40 = 8 around (28, 28): level-0 point
        # (28, 28) is inside -> positive with 0-based label 1
        i = int(np.argmin(np.abs(p[:64] - np.array([28.0, 28.0])).sum(-1)))
        assert label0[i] == 1
        # level-0 point (12, 28): |12-28| = 16 > 8 -> outside the fovea
        j = int(np.argmin(np.abs(p[:64] - np.array([12.0, 28.0])).sum(-1)))
        assert label0[j] == -1
        # level-1 (stride 16, band (32, 128)) also matches scale 40: its
        # center cell must be positive via the center-cell guarantee
        l1 = slice(64, 64 + 16)
        assert (label0[l1] >= 0).any()
        # levels 2+ (bands starting at 64+) must be all background
        assert (label0[64 + 16:] == -1).all()

    def test_log_target_values(self):
        cfg = FoveaConfig(num_classes=3)
        points, strides, bases, bands = _flat_geometry(cfg, FEATS_64)
        gt = jnp.array([[8.0, 8.0, 48.0, 48.0]])
        label0, tgt = fovea_targets(
            cfg, points, strides, bases, bands, gt,
            jnp.array([1], jnp.int32), jnp.array([True]),
        )
        p = np.asarray(points)
        i = int(np.argmin(np.abs(p[:64] - np.array([28.0, 28.0])).sum(-1)))
        # at (28, 28), base 16: (28-8)/16 = 1.25 left/top, (48-28)/16 = 1.25
        np.testing.assert_allclose(
            np.asarray(tgt)[i], np.log(np.full(4, 1.25)), atol=1e-5
        )

    def test_min_area_wins_and_invalid_ignored(self):
        cfg = FoveaConfig(num_classes=3)
        points, strides, bases, bands = _flat_geometry(cfg, FEATS_64)
        gt = jnp.array([[8.0, 8.0, 48.0, 48.0], [4.0, 4.0, 60.0, 60.0]])
        labels = jnp.array([2, 1], jnp.int32)
        label0, _ = fovea_targets(
            cfg, points, strides, bases, bands, gt, labels,
            jnp.array([True, True]),
        )
        p = np.asarray(points)
        # (28, 28) is in both foveas (big box center (32, 32), half 11.2):
        # the smaller gt (class 2 -> 0-based 1) must win
        i = int(np.argmin(np.abs(p[:64] - np.array([28.0, 28.0])).sum(-1)))
        assert np.asarray(label0)[i] == 1
        # invalidating every gt leaves only background
        label0, _ = fovea_targets(
            cfg, points, strides, bases, bands, gt, labels,
            jnp.array([False, False]),
        )
        assert (np.asarray(label0) == -1).all()


class TestFoveaDetector:
    def test_forward_shapes(self, fovea_setup, rng):
        m, vars_ = fovea_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg = m.apply(vars_, x)
        assert len(cls) == len(reg) == 5
        assert cls[0].shape == (2, 8, 8, 4)
        assert reg[0].shape == (2, 8, 8, 4)

    @pytest.mark.core
    def test_loss_grads_and_decode_roundtrip(self, fovea_setup, rng):
        m, vars_ = fovea_setup
        cfg = FoveaConfig(num_classes=4, score_thr=0.2, max_detections=10)
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
            losses = fovea_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss)) and float(aux["num_pos"]) > 0
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

        # decode inverts the target encoding: construct head outputs whose
        # positive location carries the exact log targets and a hot logit
        featmaps = FEATS_64
        points, strides, bases, bands = _flat_geometry(cfg, featmaps)
        gt = jnp.array([[8.0, 8.0, 48.0, 48.0]])
        label0, tgt = fovea_targets(
            cfg, points, strides, bases, bands, gt,
            jnp.array([2], jnp.int32), jnp.array([True]),
        )
        n_per = [h * w for h, w in featmaps]
        cls_flat = np.full((sum(n_per), cfg.num_classes), -10.0, np.float32)
        pos = np.asarray(label0) >= 0
        cls_flat[pos, 1] = 8.0
        reg_flat = np.asarray(tgt, np.float32)
        cls_lv, reg_lv, off = [], [], 0
        for (h, w), n in zip(featmaps, n_per):
            cls_lv.append(jnp.asarray(cls_flat[off:off + n].reshape(1, h, w, -1)))
            reg_lv.append(jnp.asarray(reg_flat[off:off + n].reshape(1, h, w, 4)))
            off += n
        res = decode_fovea(cfg, cls_lv, reg_lv)
        v = np.asarray(res.valid[0]) > 0
        assert v.any()
        best = int(np.argmax(np.asarray(res.scores[0]) * v))
        np.testing.assert_allclose(
            np.asarray(res.boxes[0][best]), [8.0, 8.0, 48.0, 48.0], atol=1e-3
        )
        assert int(res.labels[0][best]) == 1

    @pytest.mark.core
    def test_builder_wiring(self, fovea_setup):
        det = build_detection_cfg(dict(
            style="fovea", num_classes=4, sigma=0.5,
            scale_ranges=[[1, 64], [32, 128], [64, 256], [128, 512], [256, 2048]],
        ))
        assert isinstance(det, FoveaConfig)
        assert det.sigma == 0.5 and det.scale_ranges[1] == (32, 128)
        m, vars_ = fovea_setup
        loss_fn = build_loss_fn(m, det)
        batch = {
            "image": jnp.zeros((2, 64, 64, 3), jnp.float32),
            "gt_boxes": jnp.array(
                [[[4.0, 4.0, 30.0, 30.0]], [[10.0, 10.0, 50.0, 60.0]]]
            ),
            "gt_labels": jnp.array([[1], [2]], jnp.int32),
            "gt_valid": jnp.array([[True], [True]]),
        }
        loss, aux = jax.jit(loss_fn)(vars_["params"], vars_.get("batch_stats", {}), batch)
        assert np.isfinite(float(loss))
        assert {"loss_cls", "loss_reg", "num_pos"} <= set(aux)

    def test_inference_fn(self, fovea_setup):
        from torch_detection_tpu.engine.validate import make_inference_fn

        m, vars_ = fovea_setup
        cfg = FoveaConfig(num_classes=4, max_detections=8)
        infer = make_inference_fn(m, cfg)
        img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        shapes = jnp.array([[64.0, 64.0]])
        sf = jnp.array([[1.0, 1.0, 1.0, 1.0]])
        res = infer(vars_, img, shapes, sf)
        assert res.boxes.shape == (1, 8, 4)
        assert res.valid.shape == (1, 8)

    def test_serving_export_roundtrip(self, fovea_setup, tmp_path, rng):
        import os

        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )

        m, vars_ = fovea_setup
        cfg = FoveaConfig(num_classes=4, max_detections=10,
                          pre_nms_top_k=64, score_thr=0.0)
        exported = export_serving(m, cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "fovea.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 10, 4)
        assert np.asarray(served["valid"]).sum() > 0
