"""DETR family: transformer detector, on-device Hungarian set loss, decode.

Covers ``models/detectors/detr.py`` (+ ``ops/hungarian.py`` integration) —
the twelfth detector family; the reference has no detector tier at all
(SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    DETR,
    DETRConfig,
    decode_detr,
    detr_loss,
)
from torch_detection_tpu.models.detectors.detr import (
    _cxcywh_to_xyxy_cont,
    _gt_to_cxcywh,
    sine_position_encoding,
)


def tiny_detr(num_classes=3, queries=8):
    return DETR(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
        num_classes=num_classes,
        d_model=32,
        nhead=4,
        num_encoder_layers=2,
        num_decoder_layers=2,
        dim_feedforward=64,
        num_queries=queries,
    )


def tiny_cfg(**kw):
    kw.setdefault("num_classes", 3)
    kw.setdefault("num_queries", 8)
    kw.setdefault("max_detections", 10)
    return DETRConfig(**kw)


@pytest.fixture(scope="module")
def detr_setup():
    m = tiny_detr()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


class TestPositionEncoding:
    def test_shape_and_range(self):
        valid = jnp.ones((2, 4, 6), jnp.float32)
        pe = sine_position_encoding(valid, 32)
        assert pe.shape == (2, 4, 6, 32)
        assert float(jnp.max(jnp.abs(pe))) <= 1.0 + 1e-6

    def test_padding_invariance(self):
        """The encoding of the VALID region must not depend on how much
        padding the canvas added (the cumsum normalization spans the valid
        extent)."""
        v1 = jnp.zeros((1, 8, 8), jnp.float32).at[:, :4, :6].set(1.0)
        v2 = jnp.zeros((1, 4, 6), jnp.float32).at[:, :, :].set(1.0)
        pe1 = sine_position_encoding(v1, 16)
        pe2 = sine_position_encoding(v2, 16)
        np.testing.assert_allclose(
            np.asarray(pe1[:, :4, :6]), np.asarray(pe2), rtol=1e-5, atol=1e-6
        )


def test_box_conversion_roundtrip():
    gt = jnp.asarray([[3.0, 5.0, 30.0, 41.0], [0.0, 0.0, 63.0, 63.0]])
    hw = jnp.asarray([64.0, 64.0])
    n = _gt_to_cxcywh(gt, hw)
    # width uses continuous edges: 30 - 3 + 1 = 28 px -> 28/64
    assert float(n[0, 2]) == pytest.approx(28 / 64)
    back = _cxcywh_to_xyxy_cont(n) * jnp.asarray([64, 64, 64, 64], jnp.float32)
    back = jnp.concatenate([back[:, :2], back[:, 2:] - 1.0], axis=-1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-4)


class TestDETRDetector:
    def test_forward_shapes(self, detr_setup, rng):
        m, vars_ = detr_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, box = m.apply(vars_, x)
        assert cls.shape == (2, 2, 8, 4)  # (L_dec, B, Q, C+1)
        assert box.shape == (2, 2, 8, 4)
        b = np.asarray(box)
        assert (b >= 0).all() and (b <= 1).all()  # sigmoid boxes

    def test_padding_mask_changes_nothing_for_full_canvas(self, detr_setup, rng):
        m, vars_ = detr_setup
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        full = m.apply(vars_, x)
        shaped = m.apply(vars_, x, img_shapes=jnp.asarray([[64.0, 64.0]]))
        np.testing.assert_allclose(
            np.asarray(full[0]), np.asarray(shaped[0]), rtol=2e-5, atol=2e-5
        )

    def test_loss_and_grads(self, detr_setup, rng):
        m, vars_ = detr_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        )
        gt_labels = jnp.array([[1, 0], [2, 3]], jnp.int32)
        gt_valid = jnp.array([[True, False], [True, True]])
        shapes = jnp.asarray([[64.0, 64.0], [64.0, 64.0]])

        def loss_fn(params):
            cls, box = m.apply(
                {"params": params, **{k: v for k, v in vars_.items() if k != "params"}},
                x, img_shapes=shapes, train=True,
            )
            losses = detr_loss(cfg, cls, box, gt_boxes, gt_labels, gt_valid, shapes)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        for k in ("loss_cls", "loss_l1", "loss_giou"):
            assert np.isfinite(float(aux[k])) and float(aux[k]) >= 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert float(gnorm) > 0
        # the query embeddings and transformer layers receive gradient
        assert float(jnp.sum(jnp.abs(grads["query_embed"]))) > 0
        assert float(jnp.sum(jnp.abs(
            grads["encoder0"]["self_attn"]["query"]["kernel"]
        ))) > 0

    def test_overfit_one_image(self, rng):
        """AdamW on one fixed image: the Hungarian-matched loss must drop
        sharply (matching + CE + box terms cooperate end to end)."""
        m = tiny_detr()
        cfg = tiny_cfg(aux_loss=False)
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
                return detr_loss(cfg, cls, box, gt_boxes, gt_labels, gt_valid,
                                 shapes)["loss"]

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt2, loss

        first = None
        for _ in range(60):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.5 * first

    def test_decode_geometry(self):
        """Crafted logits/boxes: the top detection must be the confident
        query, decoded through cxcywh -> inclusive xyxy scaling."""
        cfg = tiny_cfg(num_classes=3, num_queries=4, max_detections=5)
        logits = jnp.full((1, 1, 4, 4), -10.0)  # (L, B, Q, C+1)
        logits = logits.at[0, 0, 2, 1].set(8.0)  # query 2, class 1
        boxes = jnp.full((1, 1, 4, 4), 0.5)
        boxes = boxes.at[0, 0, 2].set(jnp.asarray([0.5, 0.5, 0.25, 0.5]))
        dets = decode_detr(
            cfg, logits, boxes, img_shapes=jnp.asarray([[100.0, 200.0]])
        )
        assert bool(np.asarray(dets.valid)[0, 0])
        assert int(np.asarray(dets.labels)[0, 0]) == 1
        # cx=.5*200=100, w=.25*200=50 -> X1=75, X2=125 -> xyxy (75, 25, 124, 74)
        np.testing.assert_allclose(
            np.asarray(dets.boxes)[0, 0], [75.0, 25.0, 124.0, 74.0], atol=1e-3
        )

    def test_config_build_and_loss_fn(self):
        from torch_detection_tpu.builder import (
            build_detection_cfg, build_detector, build_loss_fn,
        )
        from torch_detection_tpu.utils import Config

        cfg_file = Config.fromfile("configs/detr_r50_coco.py")
        det = build_detection_cfg(cfg_file["detection"])
        assert isinstance(det, DETRConfig)
        assert det.num_queries == 100 and det.eos_coef == 0.1
        model = build_detector(
            dict(
                type="DETR",
                backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
                num_classes=3, d_model=32, nhead=4, num_encoder_layers=1,
                num_decoder_layers=1, dim_feedforward=32, num_queries=4,
            ),
            compute_dtype="float32",
        )
        loss_fn = build_loss_fn(model, tiny_cfg(num_queries=4))
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

    def test_export_roundtrip(self, tmp_path, rng):
        import os

        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )

        m = tiny_detr()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        cfg = tiny_cfg(score_thr=0.0, max_detections=8)
        exported = export_serving(m, cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "detr.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 8, 4)
        assert np.asarray(served["valid"]).sum() > 0
