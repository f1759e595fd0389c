"""Fast R-CNN (precomputed proposals, no RPN): the consumer of the
reference's ``proposal_file`` pathway (base_dataset.py:100-105,193-200).

Covers: loss/train-step on the fixed proposal slate, the data tier's
proposal plumbing (pkl -> transforms -> fixed-shape collate), the
evaluator's proposal routing, and the tools/dump_proposals.py ->
FastRCNN-training round trip.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from data_fixtures import make_coco

from torch_detection_tpu.builder import (
    build_detection_cfg,
    build_loss_fn,
    init_detector_variables,
)
from torch_detection_tpu.data import build_dataloader, get_datasets
from torch_detection_tpu.models.detectors import (
    FastRCNN,
    FastRCNNConfig,
    fast_rcnn_inference,
)
from torch_detection_tpu.utils.file_handler import dump, load

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

MODEL_CFG = dict(
    type="FastRCNN",
    backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16,
              num_outs=4),
    bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
)


def _tiny_model_and_cfg():
    model = FastRCNN(
        backbone=MODEL_CFG["backbone"],
        neck=MODEL_CFG["neck"],
        bbox_head=MODEL_CFG["bbox_head"],
    )
    cfg = FastRCNNConfig(
        num_classes=2, rcnn_num_samples=32, max_detections=8, score_thr=0.0
    )
    return model, cfg


def _synth_proposals(dataset_root_coco, jitter=3.0, extra=4, seed=0):
    """Reference-format proposal list aligned with the UNFILTERED image
    order: per-image (n, 5) [x1,y1,x2,y2,score] in original coordinates."""
    rng = np.random.default_rng(seed)
    # re-read the raw ann json for the unfiltered order + gt boxes
    import json

    with open(dataset_root_coco) as f:
        coco = json.load(f)
    by_img = {}
    for a in coco["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a["bbox"])
    props = []
    for im in coco["images"]:
        rows = []
        for (x, y, w, h) in by_img.get(im["id"], []):
            for _ in range(3):
                d = rng.normal(0, jitter, 4)
                rows.append([x + d[0], y + d[1], x + w - 1 + d[2], y + h - 1 + d[3], 0.9])
        for _ in range(extra):
            x0 = rng.uniform(0, im["width"] - 12)
            y0 = rng.uniform(0, im["height"] - 12)
            rows.append([x0, y0, x0 + rng.uniform(8, 24), y0 + rng.uniform(8, 24), 0.1])
        arr = np.asarray(rows, np.float32)
        arr[:, 0::2] = arr[:, 0::2].clip(0, im["width"] - 1)
        arr[:, 1::2] = arr[:, 1::2].clip(0, im["height"] - 1)
        props.append(arr)
    return props


@pytest.fixture(scope="module")
def coco_with_proposals(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fastrcnn"))
    ann_file, img_dir = make_coco(root)
    prop_file = osp.join(root, "proposals.pkl")
    dump(_synth_proposals(ann_file), prop_file)
    return ann_file, img_dir, prop_file


def _data_cfg(ann_file, img_dir, prop_file, train):
    return dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        proposal_file=prop_file, num_max_proposals=16,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.5 if train else 0, test_mode=not train,
    )


def test_proposal_plumbing_and_train_step(coco_with_proposals):
    """pkl -> dataset transforms -> fixed-shape collate -> loss -> sgd step."""
    ann_file, img_dir, prop_file = coco_with_proposals
    ds = get_datasets(_data_cfg(ann_file, img_dir, prop_file, train=True))
    loader = build_dataloader(
        ds, sample_per_replica=2, seed=0, max_gts=8, canvas=(128, 128),
        prefetch=0, max_proposals=16,
    )
    batch = next(iter(loader))
    assert batch["proposals"].shape == (2, 16, 5)
    assert batch["proposal_valid"].shape == (2, 16)
    assert batch["proposal_valid"].any()
    # proposals were scaled into the canvas frame alongside the image
    assert batch["proposals"][..., :4].max() <= 128

    model, det_cfg = _tiny_model_and_cfg()
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, MODEL_CFG, x)
    assert "bbox_head" in variables["params"]

    loss_fn = build_loss_fn(model, det_cfg)
    batch.pop("img_meta", None)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    @jax.jit
    def step(params, batch):
        def wrap(p):
            return loss_fn(p, variables.get("batch_stats", {}), batch)

        (loss, aux), grads = jax.value_and_grad(wrap, has_aux=True)(params)
        return loss, aux, grads

    loss, aux, grads = step(variables["params"], batch_j)
    assert np.isfinite(float(loss))
    assert float(aux["num_pos_rois"]) > 0
    g = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads["bbox_head"], 0.0
    )
    assert g > 0.0


def test_fast_rcnn_inference_masks_invalid_proposals():
    model, det_cfg = _tiny_model_and_cfg()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, MODEL_CFG, x)

    rng = np.random.default_rng(1)
    boxes = np.zeros((1, 8, 4), np.float32)
    boxes[0, :, 0] = rng.uniform(0, 30, 8)
    boxes[0, :, 1] = rng.uniform(0, 30, 8)
    boxes[0, :, 2] = boxes[0, :, 0] + rng.uniform(8, 20, 8)
    boxes[0, :, 3] = boxes[0, :, 1] + rng.uniform(8, 20, 8)
    valid = np.ones((1, 8), bool)
    valid[0, 5:] = False

    img = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    res = jax.jit(
        lambda v, im, p, pv: fast_rcnn_inference(
            det_cfg, model, v, im, p, pv,
            img_shapes=jnp.asarray([[64.0, 64.0]]),
            scale_factors=jnp.asarray([2.0]),
        )
    )(variables, img, jnp.asarray(boxes), jnp.asarray(valid))
    assert res.boxes.shape == (1, 8, 4)
    assert res.valid.dtype == jnp.bool_
    # score_thr=0 + random net: the 5 valid proposals yield detections,
    # and every kept detection must trace back to a valid proposal (the
    # invalid ones were score-zeroed before NMS)
    assert int(res.valid.sum()) > 0
    assert np.isfinite(np.asarray(res.boxes)).all()


def test_evaluator_routes_proposals(coco_with_proposals):
    ann_file, img_dir, prop_file = coco_with_proposals
    from torch_detection_tpu.engine.validate import evaluate_detector

    model, det_cfg = _tiny_model_and_cfg()
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, MODEL_CFG, x)
    ds = get_datasets(_data_cfg(ann_file, img_dir, prop_file, train=False))
    out = evaluate_detector(
        model, det_cfg, variables, ds, batch=2, canvas=(128, 128)
    )
    assert "mAP" in out and np.isfinite(out["mAP"])


FRCNN_CFG_TMPL = """
num_classes = 2
model = dict(
    type="TwoStageDetector",
    backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
    neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
    rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
    bbox_head=dict(type="BBoxHead", num_classes=num_classes, fc_channels=32),
)
detection = dict(
    style="faster_rcnn",
    num_classes=num_classes,
    anchor=dict(strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0), scales=(8.0,)),
    rcnn_num_samples=32,
)
data = dict(
    train=dict(
        type="CocoDataset", ann_file="{ann_file}", img_prefix="{img_dir}",
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0,
    ),
    val=dict(
        type="CocoDataset", ann_file="{ann_file}", img_prefix="{img_dir}",
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, test_mode=True,
    ),
    sample_per_replica=2,
    max_gts=8,
    canvas=(128, 128),
)
runtime = dict(work_dir="{work_dir}")
"""


@pytest.mark.slow
def test_dump_proposals_tool_roundtrip(coco_with_proposals, tmp_path):
    """tools/dump_proposals.py on a random-init FRCNN -> reference-format
    pkl -> FastRCNN trains on it through the real data tier."""
    ann_file, img_dir, _ = coco_with_proposals
    cfg_path = osp.join(str(tmp_path), "frcnn.py")
    with open(cfg_path, "w") as f:
        f.write(FRCNN_CFG_TMPL.format(
            ann_file=ann_file, img_dir=img_dir, work_dir=str(tmp_path)
        ))

    # random-init checkpoint for the tool to load
    from torch_detection_tpu.builder import build_detector
    from torch_detection_tpu.engine.checkpoint import save_checkpoint
    from torch_detection_tpu.utils import Config

    cfg = Config.fromfile(cfg_path)
    frcnn = build_detector(cfg["model"])
    det_cfg = build_detection_cfg(cfg["detection"])
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = init_detector_variables(frcnn, det_cfg, cfg["model"], x)
    ckpt = osp.join(str(tmp_path), "ckpt")
    save_checkpoint(ckpt, variables)

    out_pkl = osp.join(str(tmp_path), "props.pkl")
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/td_jax_cache")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "dump_proposals.py"),
         cfg_path, ckpt, "--split", "val", "--out", out_pkl,
         "--batch", "2", "--top-k", "16"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    props = load(out_pkl)
    assert len(props) == 3  # unfiltered image count
    for p in props:
        assert p.ndim == 2 and p.shape[1] == 5
        assert (p[:, 2] >= p[:, 0]).all() and (p[:, 3] >= p[:, 1]).all()

    # feed the dumped pkl back through the data tier into a FastRCNN step
    ds = get_datasets(_data_cfg(ann_file, img_dir, out_pkl, train=True))
    loader = build_dataloader(
        ds, sample_per_replica=2, seed=0, max_gts=8, canvas=(128, 128),
        prefetch=0, max_proposals=16,
    )
    batch = next(iter(loader))
    assert batch["proposals"].shape == (2, 16, 5)

    model, fast_cfg = _tiny_model_and_cfg()
    variables = init_detector_variables(model, fast_cfg, MODEL_CFG,
                                        jnp.zeros((2, 128, 128, 3), jnp.float32))
    loss_fn = build_loss_fn(model, fast_cfg)
    batch.pop("img_meta", None)
    loss, _ = loss_fn(
        variables["params"], variables.get("batch_stats", {}),
        {k: jnp.asarray(v) for k, v in batch.items()},
    )
    assert np.isfinite(float(loss))
