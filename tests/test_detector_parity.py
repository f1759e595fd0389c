"""Full-detector torch->flax import parity (VERDICT.md round-1 #2).

A torch RetinaNet / minimal Faster R-CNN with mmdetection state_dict naming
(the reference's lineage: resnet.py:26-33 naming contract,
models/utils/checkpoint.py:67-120 fidelity machinery) is saved, imported via
``torch://`` with the detector-level key rules, and the imported flax model
must reproduce the torch head maps <= 1e-4 (f32) and the final post-decode
+NMS detections against an independent numpy oracle.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from torch_refs import TorchFasterRCNN, TorchRetinaNet, randomize_bn_stats

from torch_detection_tpu.engine import load_checkpoint
from torch_detection_tpu.models.detectors import (
    RetinaNetConfig,
    SingleStageDetector,
    TwoStageDetector,
)
from torch_detection_tpu.models.detectors.single_stage import decode_detections
from torch_detection_tpu.models.torch_import import (
    faster_rcnn_key_rules,
    retinanet_key_rules,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator

NUM_CLASSES = 4
FEAT = 64
STACKED = 2


@pytest.fixture(scope="module")
def retina_pair(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchRetinaNet(
        depth=18, feat_channels=FEAT, num_classes=NUM_CLASSES,
        stacked_convs=STACKED, num_anchors=9,
    )
    randomize_bn_stats(tmodel)
    # push cls logits down so only a handful of detections clear score_thr
    with torch.no_grad():
        tmodel.bbox_head.retina_cls.bias.add_(-4.0)
    tmodel.eval()
    path = str(tmp_path_factory.mktemp("par") / "retina.pth")
    torch.save(tmodel.state_dict(), path)

    jmodel = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=FEAT, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True,
            relu_before_extra_convs=True,
        ),
        head=dict(
            type="RetinaHead", num_classes=NUM_CLASSES, in_channels=FEAT,
            feat_channels=FEAT, stacked_convs=STACKED, num_base_anchors=9,
        ),
    )
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = jax.jit(jmodel.init)(jax.random.PRNGKey(0), x)
    variables, _ = load_checkpoint(
        variables, "torch://" + path, strict=True,
        key_rules=retinanet_key_rules(num_laterals=3),
    )
    return tmodel, jmodel, variables


def _torch_maps(tmodel, x_np):
    with torch.no_grad():
        cls_t, reg_t = tmodel(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    # NCHW -> NHWC
    return (
        [c.numpy().transpose(0, 2, 3, 1) for c in cls_t],
        [r.numpy().transpose(0, 2, 3, 1) for r in reg_t],
    )


class TestRetinaNetImportParity:
    def test_head_maps_match(self, retina_pair):
        tmodel, jmodel, variables = retina_pair
        rng = np.random.default_rng(1)
        x_np = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
        cls_t, reg_t = _torch_maps(tmodel, x_np)
        cls_j, reg_j = jax.jit(jmodel.apply)(variables, jnp.asarray(x_np))
        assert len(cls_j) == 5 and len(reg_j) == 5
        for lvl in range(5):
            np.testing.assert_allclose(
                np.asarray(cls_j[lvl]), cls_t[lvl], atol=1e-4, rtol=1e-4,
                err_msg=f"cls level {lvl}",
            )
            np.testing.assert_allclose(
                np.asarray(reg_j[lvl]), reg_t[lvl], atol=1e-4, rtol=1e-4,
                err_msg=f"reg level {lvl}",
            )

    def test_decoded_detections_match_numpy_oracle(self, retina_pair):
        tmodel, jmodel, variables = retina_pair
        rng = np.random.default_rng(2)
        x_np = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
        cls_t, reg_t = _torch_maps(tmodel, x_np)

        gen = AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        )
        featmap_sizes = [c.shape[1:3] for c in cls_t]
        level_anchors = [np.asarray(a) for a in gen.grid_anchors(featmap_sizes)]

        # pick a score threshold that admits a few dozen candidates
        all_scores = 1.0 / (1.0 + np.exp(-np.concatenate(
            [c.reshape(-1) for c in cls_t]
        )))
        score_thr = float(np.quantile(all_scores, 1.0 - 64.0 / all_scores.size))

        cfg = RetinaNetConfig(
            num_classes=NUM_CLASSES, anchor_generator=gen,
            score_thr=score_thr, nms_iou_thr=0.5,
            pre_select_per_level=10000, pre_nms_top_k=256, max_detections=20,
        )
        res = jax.jit(lambda v, x: decode_detections(
            cfg, *jmodel.apply(v, x)
        ))(variables, jnp.asarray(x_np))
        got_valid = np.asarray(res.valid)[0]
        got = dict(
            boxes=np.asarray(res.boxes)[0][got_valid],
            scores=np.asarray(res.scores)[0][got_valid],
            labels=np.asarray(res.labels)[0][got_valid],
        )

        want = _numpy_retina_decode(
            cls_t, reg_t, level_anchors, NUM_CLASSES,
            score_thr=score_thr, iou_thr=0.5, max_out=20,
        )
        assert len(got["scores"]) == len(want["scores"])
        np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
        np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-3)
        np.testing.assert_array_equal(got["labels"], want["labels"])


def _numpy_retina_decode(cls_maps, reg_maps, level_anchors, num_classes,
                         score_thr, iou_thr, max_out):
    """Independent numpy decode + class-wise greedy NMS oracle."""
    anchors = np.concatenate(level_anchors)
    scores = np.concatenate([c.reshape(-1, num_classes) for c in cls_maps])
    deltas = np.concatenate([r.reshape(-1, 4) for r in reg_maps])
    probs = 1.0 / (1.0 + np.exp(-scores.astype(np.float64)))

    # delta2bbox with means 0 / stds 1, +1 box convention, wh clip 16/1000
    aw = anchors[:, 2] - anchors[:, 0] + 1.0
    ah = anchors[:, 3] - anchors[:, 1] + 1.0
    ax = anchors[:, 0] + 0.5 * (aw - 1.0)
    ay = anchors[:, 1] + 0.5 * (ah - 1.0)
    max_ratio = abs(float(np.log(16.0 / 1000.0)))
    dw = np.clip(deltas[:, 2], -max_ratio, max_ratio)
    dh = np.clip(deltas[:, 3], -max_ratio, max_ratio)
    w = aw * np.exp(dw)
    h = ah * np.exp(dh)
    cx = ax + deltas[:, 0] * aw
    cy = ay + deltas[:, 1] * ah
    boxes = np.stack(
        [cx - 0.5 * (w - 1.0), cy - 0.5 * (h - 1.0),
         cx + 0.5 * (w - 1.0), cy + 0.5 * (h - 1.0)], axis=-1,
    )

    cand = []  # (score, box, cls)
    for c in range(num_classes):
        sel = probs[:, c] > score_thr
        for b, s in zip(boxes[sel], probs[sel, c]):
            cand.append((s, b, c))
    cand.sort(key=lambda t: -t[0])

    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        iw, ih = max(x2 - x1 + 1, 0), max(y2 - y1 + 1, 0)
        inter = iw * ih
        aa = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
        ab = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
        return inter / (aa + ab - inter)

    kept = []
    for s, b, c in cand:
        if all(kc != c or iou(b, kb) <= iou_thr for _, kb, kc in kept):
            kept.append((s, b, c))
        if len(kept) >= max_out:
            break
    return dict(
        scores=np.array([k[0] for k in kept], np.float64),
        boxes=np.array([k[1] for k in kept], np.float64).reshape(-1, 4),
        labels=np.array([k[2] for k in kept], np.int64),
    )


class TestFasterRCNNImportParity:
    @pytest.fixture(scope="class")
    def frcnn_pair(self, tmp_path_factory):
        torch.manual_seed(3)
        tmodel = TorchFasterRCNN(
            depth=18, feat_channels=32, num_classes=NUM_CLASSES,
            roi_size=7, fc_channels=64, class_agnostic=True,
        )
        randomize_bn_stats(tmodel, seed=3)
        tmodel.eval()
        path = str(tmp_path_factory.mktemp("par2") / "frcnn.pth")
        torch.save(tmodel.state_dict(), path)

        jmodel = TwoStageDetector(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32, num_base_anchors=3),
            bbox_head=dict(type="BBoxHead", num_classes=NUM_CLASSES, fc_channels=64,
                           reg_class_agnostic=True),
        )
        x = jnp.zeros((1, 64, 96, 3), jnp.float32)
        variables = jax.jit(jmodel.init)(jax.random.PRNGKey(0), x)
        roi = jnp.zeros((1, 4, 7, 7, 32), jnp.float32)
        roi_vars = jax.jit(
            lambda rng: jmodel.init(rng, roi, method=TwoStageDetector.roi_forward)
        )(jax.random.PRNGKey(1))
        # merge: __call__ init covers backbone/neck/rpn; roi init covers bbox_head
        variables = {
            "params": {**variables["params"], **roi_vars["params"]},
            "batch_stats": variables.get("batch_stats", {}),
        }
        variables, _ = load_checkpoint(
            variables, "torch://" + path, strict=True,
            key_rules=faster_rcnn_key_rules(num_laterals=4, start_level=0),
        )
        return tmodel, jmodel, variables

    def test_rpn_maps_match(self, frcnn_pair):
        tmodel, jmodel, variables = frcnn_pair
        rng = np.random.default_rng(4)
        x_np = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
        with torch.no_grad():
            feats_t, (scores_t, deltas_t) = tmodel.forward_rpn(
                torch.from_numpy(x_np.transpose(0, 3, 1, 2))
            )
        feats_j, scores_j, deltas_j = jax.jit(jmodel.apply)(
            variables, jnp.asarray(x_np)
        )
        for lvl in range(5):
            np.testing.assert_allclose(
                np.asarray(feats_j[lvl]),
                feats_t[lvl].numpy().transpose(0, 2, 3, 1),
                atol=1e-4, rtol=1e-4, err_msg=f"fpn level {lvl}",
            )
            np.testing.assert_allclose(
                np.asarray(scores_j[lvl]),
                scores_t[lvl].numpy().transpose(0, 2, 3, 1),
                atol=1e-4, rtol=1e-4, err_msg=f"rpn cls level {lvl}",
            )
            np.testing.assert_allclose(
                np.asarray(deltas_j[lvl]),
                deltas_t[lvl].numpy().transpose(0, 2, 3, 1),
                atol=1e-4, rtol=1e-4, err_msg=f"rpn reg level {lvl}",
            )

    def test_bbox_head_matches_on_fixed_rois(self, frcnn_pair):
        """Same pooled features through both heads — validates the fc1
        CHW->HWC input permutation and all linear imports."""
        tmodel, jmodel, variables = frcnn_pair
        rng = np.random.default_rng(5)
        rois_nhwc = rng.normal(0, 1, (1, 4, 7, 7, 32)).astype(np.float32)
        cls_j, reg_j = jax.jit(
            lambda v, r: jmodel.apply(v, r, method=TwoStageDetector.roi_forward)
        )(variables, jnp.asarray(rois_nhwc))
        # torch flattens (C, H, W)
        flat_t = torch.from_numpy(
            rois_nhwc.reshape(4, 7, 7, 32).transpose(0, 3, 1, 2).reshape(4, -1)
        )
        with torch.no_grad():
            cls_t, reg_t = tmodel.bbox_head(flat_t)
        np.testing.assert_allclose(np.asarray(cls_j)[0], cls_t.numpy(), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(reg_j)[0], reg_t.numpy(), atol=1e-4, rtol=1e-4)
