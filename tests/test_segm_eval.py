"""End-to-end instance-segmentation evaluation: numpy paste parity, TTA
mask back-mapping, evaluate_detector(segm=True), and the COCO segm dump.

The reference plumbs masks through its data tier only (SURVEY.md §2 #6/#8);
the full detect->paste->mask-IoU-mAP workflow is this framework's own.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from data_fixtures import make_coco  # noqa: E402


def _random_boxes(rng, n, h, w):
    x1 = rng.uniform(-5, w - 5, n)
    y1 = rng.uniform(-5, h - 5, n)
    return np.stack(
        [x1, y1, x1 + rng.uniform(1, 25, n), y1 + rng.uniform(1, 25, n)], axis=1
    ).astype(np.float32)


class TestPasteMasksNp:
    def test_matches_jitted_paste(self, rng):
        from torch_detection_tpu.models.heads import paste_masks, paste_masks_np

        probs = rng.random((6, 14, 14)).astype(np.float32)
        boxes = _random_boxes(rng, 6, 40, 50)
        ref = np.asarray(paste_masks(jnp.asarray(probs), jnp.asarray(boxes), (40, 50)))
        out = paste_masks_np(probs, boxes, (40, 50))
        # identical math; allow a stray pixel where bilinear lands exactly on
        # the threshold with different float association
        assert (ref != out).mean() < 1e-3

    def test_empty(self):
        from torch_detection_tpu.models.heads import paste_masks_np

        out = paste_masks_np(np.zeros((0, 4, 4), np.float32), np.zeros((0, 4)), (8, 8))
        assert out.shape == (0, 8, 8)

    def test_outside_box_is_false(self):
        from torch_detection_tpu.models.heads import paste_masks_np

        probs = np.ones((1, 4, 4), np.float32)
        out = paste_masks_np(probs, np.array([[3.0, 4.0, 8.0, 9.0]]), (16, 16))
        ys, xs = np.nonzero(out[0])
        assert out[0].any()
        assert ys.min() >= 4 and ys.max() <= 9 and xs.min() >= 3 and xs.max() <= 8


class TestMasksToOriginal:
    def test_horizontal_flip_unmirrors_patch(self):
        from torch_detection_tpu.engine.tta import masks_to_original

        # asymmetric patch: left half ON in the FLIPPED frame
        probs = np.zeros((1, 4, 4), np.float32)
        probs[:, :, :2] = 1.0
        boxes = np.array([[4.0, 5.0, 9.0, 15.0]], np.float32)  # flipped frame
        meta = dict(
            img_shape=(20, 30, 3), ori_shape=(20, 30, 3),
            scale_factor=1.0, flipped_flag=True, flipped_direction="horizontal",
        )
        masks, boxes_o = masks_to_original(probs, boxes, meta)
        # bbox_flip: x' = W - x - 1  ->  [20, 5, 25, 15]
        np.testing.assert_allclose(boxes_o[0], [20, 5, 25, 15])
        assert masks.shape == (1, 20, 30)
        # flipped-frame LEFT half maps to the original box's RIGHT half
        assert masks[0, 10, 25] and masks[0, 10, 24]
        assert not masks[0, 10, 20] and not masks[0, 10, 21]

    def test_unflipped_scale(self):
        from torch_detection_tpu.engine.tta import masks_to_original

        probs = np.ones((1, 4, 4), np.float32)
        boxes = np.array([[8.0, 10.0, 18.0, 30.0]], np.float32)  # 2x frame
        meta = dict(
            img_shape=(40, 60, 3), ori_shape=(20, 30, 3),
            scale_factor=2.0, flipped_flag=False,
        )
        masks, boxes_o = masks_to_original(probs, boxes, meta)
        np.testing.assert_allclose(boxes_o[0], [4, 5, 9, 15])
        assert masks.shape == (1, 20, 30)
        assert masks[0, 10, 6]
        assert not masks[0, 2, 2]


@pytest.fixture(scope="module")
def tiny_mask_rcnn():
    from torch_detection_tpu.models.detectors import MaskRCNN, MaskRCNNConfig
    from torch_detection_tpu.models.heads import ProposalConfig
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = MaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=3, fc_channels=32),
        mask_head=dict(type="FCNMaskHead", num_classes=3, in_channels=16,
                       conv_channels=16, num_convs=1),
    )
    cfg = MaskRCNNConfig(
        num_classes=3,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        proposal_test=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        rpn_num_samples=32,
        rcnn_num_samples=16,
        max_detections=8,
        mask_roi_size=7,
        mask_size=14,
        score_thr=0.0,
    )
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), x)
    vars_roi = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 16)), method=MaskRCNN.roi_forward
    )
    vars_mask = model.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8, 7, 7, 16)), method=MaskRCNN.mask_forward
    )
    merged = {
        "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    return model, cfg, merged


class TestSegmEvaluation:
    def test_evaluate_detector_segm(self, tmp_path, tiny_mask_rcnn):
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine.validate import (
            coco_segm_dump,
            evaluate_detector,
        )

        model, cfg, variables = tiny_mask_rcnn
        ann_file, img_dir = make_coco(str(tmp_path))
        dataset = get_datasets(dict(
            type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
            size_divisor=32, test_mode=True, with_mask=True,
        ))
        metrics, detections = evaluate_detector(
            model, cfg, variables, dataset, batch=2, canvas=(128, 128),
            segm=True, return_detections=True,
        )
        assert "mAP" in metrics and "segm_mAP" in metrics
        assert 0.0 <= metrics["segm_mAP"] <= 1.0
        assert len(detections) == len(dataset)
        for i, det in enumerate(detections):
            # masks stream as COCO RLE dicts (never dense across images)
            assert isinstance(det["masks"], list)
            assert len(det["masks"]) == len(det["boxes"])
            gt_masks = dataset.get_ann_info(i)["masks"]
            if det["masks"] and len(gt_masks):
                assert tuple(det["masks"][0]["size"]) == gt_masks[0].shape

        # COCO segm results dump: RLE roundtrips through the native codec
        from torch_detection_tpu.data.ops.mask import rle_decode

        records = coco_segm_dump(dataset, detections)
        for rec in records[:5]:
            assert set(rec) == {"image_id", "category_id", "segmentation", "score"}
            decoded = rle_decode(rec["segmentation"])
            assert decoded.shape == tuple(rec["segmentation"]["size"])

    def test_segm_tta_parity(self, tmp_path, tiny_mask_rcnn):
        """Segm TTA (provenance-keeping box fusion + source-aug mask paste)
        must at least match the single-aug score on the same data — and with
        ONE configured aug must be numerically near-identical to the
        single-aug path (fusion then only re-runs NMS over one candidate
        set)."""
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine.validate import evaluate_detector

        model, cfg, variables = tiny_mask_rcnn
        ann_file, img_dir = make_coco(str(tmp_path))

        def make_ds(sizes, flip):
            return get_datasets(dict(
                type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
                img_means=(0, 0, 0), img_stds=(1, 1, 1),
                img_expected_sizes=sizes, flip_ratio=flip,
                size_divisor=32, test_mode=True, with_mask=True,
            ))

        single = evaluate_detector(
            model, cfg, variables, make_ds((100, 60), 0.0),
            batch=2, canvas=(128, 128), segm=True,
        )
        one_aug_tta = evaluate_detector(
            model, cfg, variables, make_ds((100, 60), 0.0),
            batch=2, canvas=(128, 128), segm=True, tta=True,
        )
        assert one_aug_tta["segm_mAP"] == pytest.approx(single["segm_mAP"], abs=0.05)

        multi = evaluate_detector(
            model, cfg, variables, make_ds([(100, 60), (128, 80)], 0.5),
            batch=2, canvas=(128, 128), segm=True, tta=True,
        )
        assert multi["segm_mAP"] >= single["segm_mAP"] - 0.05

    def test_segm_rejects_multi_aug_without_tta(self, tmp_path, tiny_mask_rcnn):
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine.validate import evaluate_detector

        model, cfg, variables = tiny_mask_rcnn
        ann_file, img_dir = make_coco(str(tmp_path))
        ds = get_datasets(dict(
            type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60), flip_ratio=0.5,
            size_divisor=32, test_mode=True, with_mask=True,
        ))
        with pytest.raises(ValueError, match="tta"):
            evaluate_detector(
                model, cfg, variables, ds, batch=2, canvas=(128, 128), segm=True,
            )

    def test_segm_rejects_infer_without_mask_probs(self, tmp_path, tiny_mask_rcnn):
        """A custom `infer` that lacks mask_probs must be a clear error, not
        a silent zero-mask evaluation (ADVICE r3)."""
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine.validate import (
            evaluate_detector,
            make_inference_fn,
        )

        model, cfg, variables = tiny_mask_rcnn
        ann_file, img_dir = make_coco(str(tmp_path))
        ds = get_datasets(dict(
            type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60), size_divisor=32,
            test_mode=True, with_mask=True,
        ))
        box_only = make_inference_fn(model, cfg, segm=False)
        with pytest.raises(ValueError, match="mask_probs"):
            evaluate_detector(
                model, cfg, variables, ds, batch=2, canvas=(128, 128),
                segm=True, infer=box_only,
            )

    def test_segm_rejects_boxonly_cfg(self):
        from torch_detection_tpu.engine.validate import make_inference_fn
        from torch_detection_tpu.models.detectors import RetinaNetConfig

        with pytest.raises(ValueError):
            make_inference_fn(None, RetinaNetConfig(num_classes=2), segm=True)

    def test_gt_masks_score_perfect(self, tmp_path):
        """Oracle: feeding the gt masks back as detections -> segm_mAP 1.0
        through the SAME assembly the evaluator uses."""
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine import eval_coco_segm_map

        ann_file, img_dir = make_coco(str(tmp_path))
        dataset = get_datasets(dict(
            type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
            size_divisor=32, test_mode=True, with_mask=True,
        ))
        dets, anns = [], []
        for i in range(len(dataset)):
            ann = dataset.get_ann_info(i)
            anns.append(ann)
            masks = np.asarray(ann["masks"], bool) if len(ann["masks"]) else np.zeros((0, 1, 1), bool)
            dets.append(dict(
                boxes=ann["bboxes"], scores=np.ones(len(ann["labels"]), np.float32),
                labels=ann["labels"], masks=masks,
            ))
        out = eval_coco_segm_map(dets, anns, num_classes=2)
        assert out["mAP"] == pytest.approx(1.0)
