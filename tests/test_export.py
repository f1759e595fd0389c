"""Serving export round-trip: serialize -> deserialize -> numerically equal.

Covers ``engine/export.py`` (jax.export artifact with baked-in weights; the
reference has no serving tier at all — SURVEY.md §2 #33 [ABSENT])."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.engine.export import (
    export_serving,
    load_serving,
    make_serving_fn,
    save_serving,
)
from torch_detection_tpu.models.detectors import (
    FasterRCNNConfig,
    MaskRCNN,
    MaskRCNNConfig,
    RetinaNetConfig,
    SingleStageDetector,
    TwoStageDetector,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator


def _tiny_retina():
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(type="RetinaHead", num_classes=4, in_channels=32,
                  feat_channels=32, stacked_convs=1, num_base_anchors=9),
    )
    cfg = RetinaNetConfig(
        num_classes=4,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
        max_detections=10, pre_nms_top_k=100, score_thr=0.0,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, cfg, variables


class TestServingExport:
    def test_retina_roundtrip(self, tmp_path, rng):
        model, cfg, variables = _tiny_retina()
        exported = export_serving(
            model, cfg, variables, batch=2, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "retina.jaxexp")
        save_serving(exported, path)
        assert os.path.getsize(path) > 1000

        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        shp = np.asarray([[64, 64], [48, 56]], np.int32)
        sf = np.asarray([1.0, 2.0], np.float32)
        served = load_serving(path)(img, shp, sf)
        direct = make_serving_fn(
            model, cfg, variables, compute_dtype=jnp.float32
        )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
        assert set(served) == {"boxes", "scores", "labels", "valid"}
        for k in served:
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32),
                np.asarray(direct[k], np.float32),
                rtol=1e-5, atol=1e-5,
            )
        # something must actually be detected with score_thr=0
        assert np.asarray(served["valid"]).sum() > 0

    def test_ssd_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.builder import build_detector
        from torch_detection_tpu.models.detectors import SSDConfig
        from torch_detection_tpu.ops.anchors import SSDAnchorGenerator

        model = build_detector(dict(
            type="SingleStageDetector",
            backbone=dict(type="SSDVGG", depth=16),
            neck=None,
            head=dict(type="SSDHead", num_classes=4,
                      in_channels=(512, 1024, 512, 256, 256, 256),
                      anchors_per_level=(4, 6, 6, 6, 4, 4)),
        ))
        cfg = SSDConfig(
            num_classes=4, anchor_generator=SSDAnchorGenerator(),
            max_detections=10, pre_nms_top_k=100, score_thr=0.0,
        )
        x = jnp.zeros((1, 300, 300, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(300, 300),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "ssd.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 300, 300, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[300, 300]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 10, 4)
        assert np.asarray(served["valid"]).sum() > 0

    def test_mask_rcnn_roundtrip(self, tmp_path, rng):
        model = MaskRCNN(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32, num_base_anchors=3),
            bbox_head=dict(type="BBoxHead", num_classes=4, fc_channels=64),
            mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                           conv_channels=16, num_convs=1),
        )
        cfg = MaskRCNNConfig(
            num_classes=4, max_detections=8, score_thr=0.0,
            mask_roi_size=7, mask_size=14,
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        vars_roi = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 32), jnp.float32),
            method=MaskRCNN.roi_forward,
        )
        vars_mask = model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 8, 7, 7, 32), jnp.float32),
            method=MaskRCNN.mask_forward,
        )
        variables = {
            "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
            "batch_stats": variables.get("batch_stats", {}),
        }
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "mask.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert set(served) == {"boxes", "scores", "labels", "valid", "mask_probs"}
        assert served["mask_probs"].shape == (1, 8, 14, 14)
        assert np.isfinite(np.asarray(served["mask_probs"])).all()

    def test_cascade_mask_rcnn_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.models.detectors import (
            CascadeMaskRCNN,
            CascadeMaskRCNNConfig,
        )

        model = CascadeMaskRCNN(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32, num_base_anchors=3),
            bbox_head=dict(type="BBoxHead", num_classes=4, fc_channels=64),
            mask_head=dict(type="FCNMaskHead", num_classes=4, in_channels=32,
                           conv_channels=16, num_convs=1),
            num_stages=3,
        )
        cfg = CascadeMaskRCNNConfig(
            num_classes=4, max_detections=8, score_thr=0.0,
            mask_roi_size=7, mask_size=14,
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        vars_roi = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 32), jnp.float32),
            method=CascadeMaskRCNN.roi_forward_all,
        )
        vars_mask = model.init(
            jax.random.PRNGKey(2), jnp.zeros((1, 8, 7, 7, 32), jnp.float32),
            method=CascadeMaskRCNN.mask_forward_all,
        )
        variables = {
            "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
            "batch_stats": variables.get("batch_stats", {}),
        }
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "cmr.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert set(served) == {"boxes", "scores", "labels", "valid", "mask_probs"}
        assert served["mask_probs"].shape == (1, 8, 14, 14)
        assert np.isfinite(np.asarray(served["mask_probs"])).all()

    def test_two_stage_roundtrip(self, tmp_path, rng):
        model = TwoStageDetector(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32, num_base_anchors=3),
            bbox_head=dict(type="BBoxHead", num_classes=4, fc_channels=64),
        )
        cfg = FasterRCNNConfig(num_classes=4, max_detections=8, score_thr=0.0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        vars_roi = model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 32), jnp.float32),
            method=TwoStageDetector.roi_forward,
        )
        variables = {
            "params": {**variables["params"], **vars_roi["params"]},
            "batch_stats": variables.get("batch_stats", {}),
        }
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "frcnn.jaxexp")
        save_serving(exported, path)

        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        shp = np.asarray([[64, 64]], np.int32)
        sf = np.ones((1,), np.float32)
        served = load_serving(path)(img, shp, sf)
        direct = make_serving_fn(
            model, cfg, variables, compute_dtype=jnp.float32
        )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
        for k in served:
            # the artifact and the live jit are separate compilations; f32
            # matmul reassociation differs at the ~1e-4 level (fc box head)
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32),
                np.asarray(direct[k], np.float32),
                rtol=2e-3, atol=2e-3,
            )


class TestServingExportYOLO:
    def test_yolo_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.models.detectors import YOLOV3Config
        from torch_detection_tpu.ops.anchors import YOLOAnchorGenerator

        model = SingleStageDetector(
            backbone=dict(type="Darknet", depth=53, stages=(1, 1, 1, 1, 1),
                          base_channels=8, out_indices=(2, 3, 4)),
            neck=dict(type="YOLOV3Neck", in_channels=(64, 128, 256),
                      out_channels=(64, 32, 16)),
            head=dict(type="YOLOV3Head", num_classes=4, anchors_per_level=1,
                      in_channels=(64, 32, 16), out_channels=(128, 64, 32)),
        )
        cfg = YOLOV3Config(
            num_classes=4,
            anchor_generator=YOLOAnchorGenerator(
                strides=(32, 16, 8),
                base_sizes=(((48.0, 48.0),), ((24.0, 24.0),), ((12.0, 12.0),)),
            ),
            max_detections=10, pre_nms_top_k=100, score_thr=0.0, conf_thr=0.0,
            pre_select_per_level=50,
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        exported = export_serving(
            model, cfg, variables, batch=2, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "yolo.jaxexp")
        save_serving(exported, path)

        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        shp = np.asarray([[64, 64], [48, 56]], np.int32)
        sf = np.asarray([1.0, 2.0], np.float32)
        served = load_serving(path)(img, shp, sf)
        direct = make_serving_fn(
            model, cfg, variables, compute_dtype=jnp.float32
        )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
        assert set(served) == {"boxes", "scores", "labels", "valid"}
        for k in served:
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32),
                np.asarray(direct[k], np.float32),
                rtol=1e-5, atol=1e-5,
            )
        assert np.asarray(served["valid"]).sum() > 0


class TestServingExportCenterNet:
    def test_centernet_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.models.detectors import CenterNetConfig

        model = SingleStageDetector(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
            neck=dict(type="CTResNetNeck", in_channels=512,
                      num_deconv_filters=(32, 16, 16)),
            head=dict(type="CenterNetHead", num_classes=4, in_channels=16,
                      feat_channels=16),
        )
        cfg = CenterNetConfig(num_classes=4, max_detections=10, score_thr=0.0)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        exported = export_serving(
            model, cfg, variables, batch=2, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "centernet.jaxexp")
        save_serving(exported, path)

        img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
        shp = np.asarray([[64, 64], [48, 56]], np.int32)
        sf = np.asarray([1.0, 2.0], np.float32)
        served = load_serving(path)(img, shp, sf)
        direct = make_serving_fn(
            model, cfg, variables, compute_dtype=jnp.float32
        )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
        assert set(served) == {"boxes", "scores", "labels", "valid"}
        for k in served:
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32),
                np.asarray(direct[k], np.float32),
                rtol=1e-5, atol=1e-5,
            )
        assert np.asarray(served["valid"]).sum() > 0


def test_paa_roundtrip(tmp_path, rng):
    """PAA export: the serve fn routes the 3-output head through decode_paa
    (IoU rescoring + score voting) and the artifact round-trips."""
    from torch_detection_tpu.models.detectors import PAAConfig

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True,
            relu_before_extra_convs=True,
        ),
        head=dict(type="PAAHead", num_classes=4, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    cfg = PAAConfig(
        num_classes=4,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(1.0,),
            octave_base_scale=8.0, scales_per_octave=1,
        ),
        max_detections=10, pre_nms_top_k=100, score_thr=0.0,
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    exported = export_serving(
        model, cfg, variables, batch=1, canvas=(64, 64),
        compute_dtype=jnp.float32,
    )
    path = os.path.join(tmp_path, "paa.jaxexp")
    save_serving(exported, path)
    img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    shp = np.asarray([[64, 64]], np.int32)
    sf = np.ones((1,), np.float32)
    served = load_serving(path)(img, shp, sf)
    direct = make_serving_fn(
        model, cfg, variables, compute_dtype=jnp.float32
    )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
    for k in served:
        np.testing.assert_allclose(
            np.asarray(served[k], np.float32), np.asarray(direct[k], np.float32),
            rtol=1e-5, atol=1e-5,
        )
    assert np.asarray(served["valid"]).sum() > 0


class TestServingExportSOLOV2:
    def test_solov2_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.models.detectors import SOLOV2, SOLOV2Config

        model = SOLOV2(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
            head=dict(type="SOLOV2Head", num_classes=4, in_channels=16, feat_channels=16,
                      kernel_channels=8, stacked_convs=1, grid_numbers=(12, 10, 8, 6, 4),
                      norm_groups=4),
            mask_feat_head=dict(type="MaskFeatHead", in_channels=16, feat_channels=16,
                                out_channels=8, num_inputs=4, norm_groups=4),
        )
        cfg = SOLOV2Config(
            num_classes=4, grid_numbers=(12, 10, 8, 6, 4),
            scale_ranges=((1, 32), (16, 48), (32, 64), (48, 96), (64, 256)),
            pre_nms_top_k=16, max_detections=8, mask_out_size=14,
            score_thr=0.0, update_thr=0.0,
        )
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "solov2.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert set(served) == {"boxes", "scores", "labels", "valid", "mask_probs"}
        assert served["mask_probs"].shape == (1, 8, 14, 14)
        assert np.isfinite(np.asarray(served["mask_probs"])).all()


class TestServingExportYOLOX:
    def test_yolox_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.models.detectors import YOLOXConfig

        model = SingleStageDetector(
            backbone=dict(type="CSPDarknet", deepen_factor=0.33,
                          widen_factor=0.125, out_indices=(2, 3, 4)),
            neck=dict(type="YOLOXPAFPN", in_channels=(32, 64, 128),
                      out_channels=32, num_csp_blocks=1),
            head=dict(type="YOLOXHead", num_classes=4, in_channels=32,
                      feat_channels=32, stacked_convs=1),
        )
        cfg = YOLOXConfig(num_classes=4, max_detections=8, pre_nms_top_k=64,
                          score_thr=0.0)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )
        exported = export_serving(
            model, cfg, variables, batch=1, canvas=(64, 64),
            compute_dtype=jnp.float32,
        )
        path = os.path.join(tmp_path, "yolox.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert set(served) == {"boxes", "scores", "labels", "valid"}
        assert served["boxes"].shape == (1, 8, 4)
        assert np.asarray(served["valid"]).sum() > 0  # score_thr=0
