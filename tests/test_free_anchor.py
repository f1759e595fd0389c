"""FreeAnchor (learning-to-match anchor bags) family: loss oracle + wiring.

Covers ``models/detectors/free_anchor.py`` — the fourteenth detector
family.  The model graph and inference path are RetinaNet's; only the
training objective changes, so the tests focus on the bag-likelihood loss:
a per-gt python-loop numpy oracle of the published formulation, padded-gt
invariance, gradient flow, and builder/config wiring."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.builder import build_detection_cfg, build_loss_fn
from torch_detection_tpu.models.detectors import (
    FreeAnchorConfig,
    RetinaNetConfig,
    SingleStageDetector,
    decode_detections,
    free_anchor_loss,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator


# ---------------------------------------------------------------------------
# numpy oracle (explicit per-gt loops; +1 inclusive-pixel conventions)

def np_iou(a, b):
    """(N,4) x (G,4) -> (N,G) IoU with the framework's offset=1 convention."""
    n, g = a.shape[0], b.shape[0]
    out = np.zeros((n, g))
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    for i in range(n):
        for j in range(g):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + 1
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + 1
            inter = max(iw, 0.0) * max(ih, 0.0)
            out[i, j] = inter / max(area_a[i] + area_b[j] - inter, 1e-6)
    return out


def np_encode(props, gt, stds):
    pw = props[:, 2] - props[:, 0] + 1
    ph = props[:, 3] - props[:, 1] + 1
    px = props[:, 0] + 0.5 * (pw - 1)
    py = props[:, 1] + 0.5 * (ph - 1)
    gw = gt[2] - gt[0] + 1
    gh = gt[3] - gt[1] + 1
    gx = gt[0] + 0.5 * (gw - 1)
    gy = gt[1] + 0.5 * (gh - 1)
    d = np.stack([(gx - px) / pw, (gy - py) / ph,
                  np.log(gw / pw), np.log(gh / ph)], -1)
    return d / np.asarray(stds)


def np_decode(props, deltas, stds):
    d = deltas * np.asarray(stds)
    clip = abs(np.log(16.0 / 1000.0))
    dw = np.clip(d[:, 2], -clip, clip)
    dh = np.clip(d[:, 3], -clip, clip)
    pw = props[:, 2] - props[:, 0] + 1
    ph = props[:, 3] - props[:, 1] + 1
    px = props[:, 0] + 0.5 * (pw - 1)
    py = props[:, 1] + 0.5 * (ph - 1)
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    gx = px + pw * d[:, 0]
    gy = py + ph * d[:, 1]
    return np.stack([gx - 0.5 * (gw - 1), gy - 0.5 * (gh - 1),
                     gx + 0.5 * (gw - 1), gy + 0.5 * (gh - 1)], -1)


def np_free_anchor(cfg, anchors, cls_logits, reg, boxes, labels, valid):
    """Single-image oracle: (pos_loss_sum, neg_loss_sum, num_pos)."""
    stds = cfg.target_stds
    cls_prob = 1.0 / (1.0 + np.exp(-cls_logits.astype(np.float64)))
    decoded = np_decode(anchors, reg.astype(np.float64), stds)
    # negative term
    obj_box_prob = np.zeros_like(cls_prob)  # (N, C)
    for j in range(len(boxes)):
        if not valid[j]:
            continue
        iou_j = np_iou(decoded, boxes[j: j + 1])[:, 0]  # (N,)
        t1 = cfg.bbox_thr
        denom = max(iou_j.max() - t1, 1e-6)
        ramp = np.clip((iou_j - t1) / denom, 0.0, 1.0)
        c = labels[j] - 1
        obj_box_prob[:, c] = np.maximum(obj_box_prob[:, c], ramp)
    p_bg = np.clip(cls_prob * (1 - obj_box_prob), 0.0, 1.0 - 1e-12)
    neg = np.sum(p_bg ** cfg.bag_gamma * -np.log1p(-p_bg))
    # positive term
    pos = 0.0
    num_pos = 0
    beta = cfg.smooth_l1_beta
    for j in range(len(boxes)):
        if not valid[j]:
            continue
        num_pos += 1
        iou_j = np_iou(anchors, boxes[j: j + 1])[:, 0]
        bag = np.argsort(-iou_j, kind="stable")[: cfg.pre_anchor_topk]
        c = labels[j] - 1
        probs = []
        for a in bag:
            t = np_encode(anchors[a: a + 1], boxes[j], stds)[0]
            diff = np.abs(reg[a].astype(np.float64) - t)
            hub = np.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
            probs.append(cls_prob[a, c] * np.exp(-cfg.loc_loss_weight * hub.sum()))
        probs = np.asarray(probs)
        w = 1.0 / np.clip(1.0 - probs, 1e-12, None)
        w = w / w.sum()
        pos += -np.log(max((w * probs).sum(), 1e-12))
    return pos, neg, num_pos


# ---------------------------------------------------------------------------

def tiny_cfg(num_classes=4, k=4):
    return FreeAnchorConfig(
        num_classes=num_classes,
        anchor_generator=AnchorGenerator(
            strides=(8, 16), ratios=(0.5, 1.0), octave_base_scale=4.0,
            scales_per_octave=1,
        ),
        target_stds=(0.1, 0.1, 0.2, 0.2),
        pre_anchor_topk=k,
    )


def random_case(cfg, feats, b=2, g=5, seed=0):
    rng = np.random.RandomState(seed)
    anchors = np.asarray(cfg.anchor_generator.flat_anchors(feats))
    n = anchors.shape[0]
    a_per = 2  # ratios x scales
    cls = [rng.randn(b, h, w, a_per * cfg.num_classes).astype(np.float32)
           for (h, w) in feats]
    reg = [0.3 * rng.randn(b, h, w, a_per * 4).astype(np.float32)
           for (h, w) in feats]
    x1 = rng.uniform(0, 60, (b, g, 1))
    y1 = rng.uniform(0, 60, (b, g, 1))
    boxes = np.concatenate(
        [x1, y1, x1 + rng.uniform(8, 60, (b, g, 1)),
         y1 + rng.uniform(8, 60, (b, g, 1))], -1
    ).astype(np.float32)
    labels = rng.randint(1, cfg.num_classes + 1, (b, g)).astype(np.int32)
    valid = rng.rand(b, g) < 0.7
    valid[:, 0] = True  # at least one gt per image
    return anchors, n, cls, reg, boxes, labels, valid


FEATS = [(6, 6), (3, 3)]


@pytest.mark.core
class TestFreeAnchorLoss:
    def test_matches_loop_oracle(self):
        cfg = tiny_cfg()
        anchors, n, cls, reg, boxes, labels, valid = random_case(cfg, FEATS)
        out = jax.jit(lambda *a: free_anchor_loss(cfg, *a), static_argnums=())(
            [jnp.asarray(c) for c in cls], [jnp.asarray(r) for r in reg],
            jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid),
        )
        b = boxes.shape[0]
        flat_cls = np.concatenate(
            [c.reshape(b, -1, cfg.num_classes) for c in cls], 1)
        flat_reg = np.concatenate([r.reshape(b, -1, 4) for r in reg], 1)
        pos_sum = neg_sum = np_sum = 0.0
        for i in range(b):
            p, ng, np_ = np_free_anchor(
                cfg, anchors, flat_cls[i], flat_reg[i], boxes[i], labels[i],
                valid[i],
            )
            pos_sum += p
            neg_sum += ng
            np_sum += np_
        total = max(np_sum, 1.0)
        np.testing.assert_allclose(
            float(out["loss_pos"]), cfg.bag_alpha * pos_sum / total, rtol=2e-4)
        np.testing.assert_allclose(
            float(out["loss_neg"]),
            (1 - cfg.bag_alpha) * neg_sum / (total * cfg.pre_anchor_topk),
            rtol=2e-4)
        assert float(out["num_pos"]) == pytest.approx(np_sum / b)

    def test_padded_gt_invariance(self):
        """Extending the gt slate with invalid rows must not move the loss."""
        cfg = tiny_cfg()
        _, _, cls, reg, boxes, labels, valid = random_case(cfg, FEATS, g=4, seed=1)
        args = ([jnp.asarray(c) for c in cls], [jnp.asarray(r) for r in reg])
        out1 = free_anchor_loss(cfg, *args, jnp.asarray(boxes),
                                jnp.asarray(labels), jnp.asarray(valid))
        pad = 3
        boxes2 = np.concatenate([boxes, np.tile(boxes[:, :1], (1, pad, 1))], 1)
        labels2 = np.concatenate([labels, labels[:, :pad]], 1)
        valid2 = np.concatenate([valid, np.zeros((2, pad), bool)], 1)
        out2 = free_anchor_loss(cfg, *args, jnp.asarray(boxes2),
                                jnp.asarray(labels2), jnp.asarray(valid2))
        np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                                   rtol=1e-6)

    def test_gradients_flow_and_finite(self):
        cfg = tiny_cfg()
        _, _, cls, reg, boxes, labels, valid = random_case(cfg, FEATS, seed=2)

        def f(cls, reg):
            return free_anchor_loss(
                cfg, cls, reg, jnp.asarray(boxes), jnp.asarray(labels),
                jnp.asarray(valid))["loss"]

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(
            [jnp.asarray(c) for c in cls], [jnp.asarray(r) for r in reg])
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)

    def test_negative_term_detached_from_regression(self):
        """d(loss_neg)/d(reg) must be exactly zero: the decode->IoU->ramp
        block is stop_gradient'ed (official FreeAnchor computes
        object_box_prob under torch.no_grad())."""
        cfg = tiny_cfg()
        _, _, cls, reg, boxes, labels, valid = random_case(cfg, FEATS, seed=5)

        def neg_only(reg):
            return free_anchor_loss(
                cfg, [jnp.asarray(c) for c in cls], reg, jnp.asarray(boxes),
                jnp.asarray(labels), jnp.asarray(valid))["loss_neg"]

        grads = jax.grad(neg_only)([jnp.asarray(r) for r in reg])
        for g in jax.tree_util.tree_leaves(grads):
            np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_no_valid_gt_gives_finite_loss(self):
        cfg = tiny_cfg()
        _, _, cls, reg, boxes, labels, valid = random_case(cfg, FEATS, seed=3)
        out = free_anchor_loss(
            cfg, [jnp.asarray(c) for c in cls], [jnp.asarray(r) for r in reg],
            jnp.asarray(boxes), jnp.asarray(labels),
            jnp.zeros_like(jnp.asarray(valid)))
        assert np.isfinite(float(out["loss"]))
        assert float(out["loss_pos"]) == 0.0


@pytest.mark.slow
def test_free_anchor_overfit_single_image():
    """The bag likelihood must localize: overfit one synthetic square and
    recover it through the inherited RetinaNet decode."""
    import optax

    from torch_detection_tpu.parallel import create_train_state, make_train_step

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="RetinaHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1, num_base_anchors=9),
    )
    cfg = FreeAnchorConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(4, 8, 16)),
        target_stds=(0.1, 0.1, 0.2, 0.2),
        pre_anchor_topk=16,
        score_thr=0.05,
        max_detections=5,
        pre_nms_top_k=100,
    )
    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.1, (1, 64, 64, 3)).astype(np.float32)
    img[0, 16:40, 16:40, :] += 2.0
    x = jnp.asarray(img)
    batch = {
        "image": x,
        "gt_boxes": jnp.array([[[16.0, 16.0, 39.0, 39.0]]]),
        "gt_labels": jnp.array([[1]], jnp.int32),
        "gt_valid": jnp.array([[True]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    loss_fn = build_loss_fn(model, cfg)
    tx = optax.adam(1e-3)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables["batch_stats"])
    step = make_train_step(loss_fn, tx, donate_state=False)
    first_loss = None
    for _ in range(150):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < 0.3 * first_loss, (first_loss, final_loss)

    cls, reg = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x)
    dets = decode_detections(cfg, cls, reg)
    v = np.asarray(dets.valid[0])
    assert v.any(), "no detections after overfitting"
    best = int(np.argmax(np.asarray(dets.scores[0])))
    assert np.asarray(dets.labels[0])[best] == 0
    box = np.asarray(dets.boxes[0][best])
    gt = np.array([16.0, 16.0, 39.0, 39.0])
    iou = np_iou(box[None], gt[None])[0, 0]
    assert iou > 0.5, (box, iou)


@pytest.mark.core
class TestFreeAnchorWiring:
    def test_builder_config(self):
        cfg = build_detection_cfg(dict(
            style="free_anchor", num_classes=7, pre_anchor_topk=9,
            bbox_thr=0.55, bag_alpha=0.4,
            anchor=dict(strides=(8, 16), ratios=(1.0,),
                        octave_base_scale=4.0, scales_per_octave=1),
        ))
        assert isinstance(cfg, FreeAnchorConfig)
        assert isinstance(cfg, RetinaNetConfig)  # inference path inherited
        assert cfg.pre_anchor_topk == 9 and cfg.num_classes == 7
        assert cfg.bag_alpha == 0.4

    def test_loss_fn_and_inference_through_retina_path(self):
        m = SingleStageDetector(
            backbone=dict(type="ResNet", depth=18, num_stages=4,
                          out_indices=(1, 2, 3)),
            neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                      num_outs=5, add_extra_convs=True,
                      extra_convs_on_inputs=True, relu_before_extra_convs=True),
            head=dict(type="RetinaHead", num_classes=4, in_channels=32,
                      feat_channels=32, stacked_convs=1, num_base_anchors=2),
        )
        cfg = dataclasses.replace(
            tiny_cfg(),
            anchor_generator=AnchorGenerator(
                strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0),
                octave_base_scale=4.0, scales_per_octave=1),
            pre_anchor_topk=8,
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        batch = {
            "image": x,
            "gt_boxes": jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]]),
            "gt_labels": jnp.asarray([[2]], jnp.int32),
            "gt_valid": jnp.asarray([[True]]),
        }
        loss_fn = build_loss_fn(m, cfg)
        loss, aux = loss_fn(vars_["params"], vars_.get("batch_stats", {}), batch)
        assert np.isfinite(float(loss))
        assert {"loss_pos", "loss_neg", "num_pos"} <= set(aux)
        # inference: the inherited RetinaNet decode works on the same outputs
        cls, reg = m.apply(vars_, x)
        det = decode_detections(cfg, cls, reg)
        assert det.boxes.shape == (1, cfg.max_detections, 4)
