"""Sparse R-CNN family: learnable proposals, dynamic-interaction stages,
per-stage Hungarian set losses, NMS-free decode.

Covers ``models/detectors/sparse_rcnn.py`` — the sixteenth detector
family; the reference has no detector tier at all (SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    SparseRCNN,
    SparseRCNNConfig,
    decode_sparse_rcnn,
    sparse_rcnn_loss,
)


def tiny_sparse_rcnn(num_classes=3, proposals=8, stages=2):
    return SparseRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=32, num_outs=4),
        num_proposals=proposals,
        num_stages=stages,
        num_classes=num_classes,
        d_model=32,
        nhead=4,
        dim_feedforward=64,
        dynamic_dim=16,
        roi_size=7,
        roi_strides=(4, 8, 16, 32),
    )


def tiny_cfg(**kw):
    kw.setdefault("num_classes", 3)
    kw.setdefault("num_proposals", 8)
    kw.setdefault("max_detections", 10)
    return SparseRCNNConfig(**kw)


@pytest.fixture(scope="module")
def sparse_setup():
    m = tiny_sparse_rcnn()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


class TestSparseRCNNDetector:
    def test_forward_shapes(self, sparse_setup, rng):
        m, vars_ = sparse_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, box = m.apply(vars_, x)
        assert cls.shape == (2, 2, 8, 3)  # (S, B, N, C)
        assert box.shape == (2, 2, 8, 4)
        b = np.asarray(box)
        # delta decode through exp keeps widths/heights positive
        assert (b[..., 2] > b[..., 0]).all()
        assert (b[..., 3] > b[..., 1]).all()

    def test_initial_proposals_fill_image(self, sparse_setup):
        """At init the learnable slate is the full-image box, so stage-0
        rois scale with img_shapes."""
        m, vars_ = sparse_setup
        pb = np.asarray(vars_["params"]["proposal_boxes"])
        np.testing.assert_allclose(pb, np.tile([[0.5, 0.5, 1.0, 1.0]], (8, 1)))

    def test_loss_and_grads(self, sparse_setup, rng):
        m, vars_ = sparse_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        )
        gt_labels = jnp.array([[1, 0], [2, 3]], jnp.int32)
        gt_valid = jnp.array([[True, False], [True, True]])
        shapes = jnp.asarray([[64.0, 64.0], [64.0, 64.0]])
        rest = {k: v for k, v in vars_.items() if k != "params"}

        def loss_fn(params):
            cls, box = m.apply({"params": params, **rest}, x,
                               img_shapes=shapes, train=True)
            losses = sparse_rcnn_loss(
                cfg, cls, box, gt_boxes, gt_labels, gt_valid, shapes
            )
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        for k in ("loss_cls", "loss_l1", "loss_giou"):
            assert np.isfinite(float(aux[k])) and float(aux[k]) >= 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
        # the learnable slate trains: boxes through the stage-0 delta decode,
        # features through every stage
        assert float(jnp.sum(jnp.abs(grads["proposal_boxes"]))) > 0
        assert float(jnp.sum(jnp.abs(grads["proposal_features"]))) > 0
        # both stages receive gradient
        for s in ("stage0", "stage1"):
            assert float(jnp.sum(jnp.abs(grads[s]["fc_cls"]["kernel"]))) > 0

    def test_padded_gt_invariance(self, sparse_setup, rng):
        """Invalid gt slate rows must not change the loss (matching masks
        them via row_valid; loss terms weight them out)."""
        m, vars_ = sparse_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        shapes = jnp.asarray([[64.0, 64.0]])
        cls, box = m.apply(vars_, x, img_shapes=shapes, train=True)

        gt1 = jnp.asarray([[[8.0, 8.0, 40.0, 36.0]]])
        lab1 = jnp.asarray([[2]], jnp.int32)
        val1 = jnp.asarray([[True]])
        l1 = sparse_rcnn_loss(cfg, cls, box, gt1, lab1, val1, shapes)

        pad = jnp.asarray([[[50.0, 50.0, 60.0, 60.0]] * 3])
        gt2 = jnp.concatenate([gt1, pad], axis=1)
        lab2 = jnp.concatenate([lab1, jnp.full((1, 3), 1, jnp.int32)], axis=1)
        val2 = jnp.concatenate([val1, jnp.zeros((1, 3), bool)], axis=1)
        l2 = sparse_rcnn_loss(cfg, cls, box, gt2, lab2, val2, shapes)
        for k in ("loss", "loss_cls", "loss_l1", "loss_giou"):
            np.testing.assert_allclose(
                float(l1[k]), float(l2[k]), rtol=1e-5, atol=1e-6
            )

    def test_overfit_one_image(self, rng):
        """AdamW on one fixed image: the per-stage matched losses must drop
        sharply (proposals, dynamic conv, and decode cooperate)."""
        m = tiny_sparse_rcnn()
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array([[[8.0, 8.0, 40.0, 36.0], [30.0, 30.0, 60.0, 62.0]]])
        gt_labels = jnp.array([[2, 1]], jnp.int32)
        gt_valid = jnp.array([[True, True]])
        shapes = jnp.asarray([[64.0, 64.0]])
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(1), x)
        tx = optax.adamw(1e-3)
        params = vars_["params"]
        rest = {k: v for k, v in vars_.items() if k != "params"}
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                cls, box = m.apply({"params": p, **rest}, x, img_shapes=shapes,
                                   train=True)
                return sparse_rcnn_loss(cfg, cls, box, gt_boxes, gt_labels,
                                        gt_valid, shapes)["loss"]

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt2, loss

        first = None
        for _ in range(60):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.5 * first, (first, float(loss))

    def test_decode_geometry(self):
        """Crafted logits/boxes: the top detection is the confident
        (proposal, class) pair; boxes pass through absolute continuous ->
        inclusive conversion + image clipping."""
        cfg = tiny_cfg(num_classes=3, num_proposals=4, max_detections=5)
        logits = jnp.full((1, 1, 4, 3), -10.0)  # (S, B, N, C)
        logits = logits.at[0, 0, 2, 1].set(8.0)  # proposal 2, class 1
        boxes = jnp.tile(jnp.asarray([10.0, 10.0, 20.0, 20.0]), (1, 1, 4, 1))
        boxes = boxes.at[0, 0, 2].set(jnp.asarray([75.0, 25.0, 125.0, 75.0]))
        dets = decode_sparse_rcnn(
            cfg, logits, boxes, img_shapes=jnp.asarray([[100.0, 200.0]])
        )
        assert bool(np.asarray(dets.valid)[0, 0])
        assert int(np.asarray(dets.labels)[0, 0]) == 1
        # continuous (75, 25, 125, 75) -> inclusive (75, 25, 124, 74)
        np.testing.assert_allclose(
            np.asarray(dets.boxes)[0, 0], [75.0, 25.0, 124.0, 74.0], atol=1e-3
        )

    def test_decode_clips_to_image(self):
        cfg = tiny_cfg(num_classes=3, num_proposals=2, max_detections=2)
        logits = jnp.full((1, 1, 2, 3), 5.0)
        boxes = jnp.tile(jnp.asarray([-10.0, -5.0, 300.0, 200.0]), (1, 1, 2, 1))
        dets = decode_sparse_rcnn(
            cfg, logits, boxes, img_shapes=jnp.asarray([[100.0, 200.0]])
        )
        b = np.asarray(dets.boxes)[0]
        assert (b[:, 0] >= 0).all() and (b[:, 1] >= 0).all()
        assert (b[:, 2] <= 199.0).all() and (b[:, 3] <= 99.0).all()

    def test_config_build_and_loss_fn(self):
        from torch_detection_tpu.builder import (
            build_detection_cfg, build_detector, build_loss_fn,
        )
        from torch_detection_tpu.utils import Config

        cfg_file = Config.fromfile("configs/sparse_rcnn_r50_fpn_coco.py")
        det = build_detection_cfg(cfg_file["detection"])
        assert isinstance(det, SparseRCNNConfig)
        assert det.num_proposals == 100 and det.cls_weight == 2.0
        assert cfg_file["optimizer"]["type"] == "adamw"

        model = build_detector(
            dict(
                type="SparseRCNN",
                backbone=dict(type="ResNet", depth=18, num_stages=4,
                              out_indices=(0, 1, 2, 3)),
                neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                          out_channels=32, num_outs=4),
                num_proposals=4, num_stages=2, num_classes=3, d_model=32,
                nhead=4, dim_feedforward=32, dynamic_dim=8,
            ),
            compute_dtype="float32",
        )
        loss_fn = build_loss_fn(model, tiny_cfg(num_proposals=4))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        batch = {
            "image": x,
            "img_shape": jnp.asarray([[64, 64]], jnp.int32),
            "gt_boxes": jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]]),
            "gt_labels": jnp.asarray([[1]], jnp.int32),
            "gt_valid": jnp.asarray([[True]]),
        }
        loss, aux = jax.jit(loss_fn)(
            vars_["params"], vars_.get("batch_stats", {}), batch
        )
        assert np.isfinite(float(loss))
        assert "loss_giou" in aux

    def test_export_roundtrip(self, tmp_path, rng):
        import os

        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )

        m = tiny_sparse_rcnn()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        cfg = tiny_cfg(score_thr=0.0, max_detections=8)
        exported = export_serving(m, cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "sparse_rcnn.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 8, 4)
        assert np.asarray(served["valid"]).sum() > 0

    def test_inference_fn_route(self, sparse_setup):
        from torch_detection_tpu.engine.validate import make_inference_fn

        m, vars_ = sparse_setup
        cfg = tiny_cfg()
        infer = make_inference_fn(m, cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        dets = infer(
            vars_, x, jnp.asarray([[64.0, 64.0]]), jnp.asarray([[1.0]])
        )
        assert dets.boxes.shape == (1, 10, 4)
        assert dets.scores.shape == (1, 10)
