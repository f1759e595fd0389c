"""Simulated multi-host training end-to-end (VERDICT.md round-1 #6).

Two explicit (num_replicas=2, rank) DistributedGroupSampler shards feed a
2-device data mesh; the DP-sharded train step on the concatenated global
batch must produce the same loss and parameters as a single-device step on
the identical batch, and the shards must cover the epoch disjointly.
Reference analog: datasets/loader/dataset_sampler.py:69-179 (the one
distributed artifact the reference shipped).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from data_fixtures import make_coco

from torch_detection_tpu.data import build_dataloader, get_datasets
from torch_detection_tpu.models.detectors import RetinaNetConfig, SingleStageDetector, retina_loss
from torch_detection_tpu.ops.anchors import AnchorGenerator
from torch_detection_tpu.parallel import (
    create_train_state,
    make_mesh,
    make_train_step,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def coco_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mh"))
    ann_file, img_dir = make_coco(root)
    return get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0,
    ))


def _replica_loader(dataset, rank):
    return build_dataloader(
        dataset, sample_per_replica=2, dist=True, num_replicas=2, rank=rank,
        seed=11, max_gts=8, canvas=(128, 128), prefetch=0,
    )


@pytest.mark.core
def test_replica_shards_disjoint_and_cover(coco_dataset):
    loaders = [_replica_loader(coco_dataset, r) for r in (0, 1)]
    seen = []
    for loader in loaders:
        idxs = list(iter(loader.sampler))
        seen.append(idxs)
        assert len(idxs) == len(loader.sampler)
    # same per-rank length, disjoint as multisets up to the cyclic pad,
    # union covers every dataset index
    assert len(seen[0]) == len(seen[1])
    union = set(seen[0]) | set(seen[1])
    assert union == set(range(len(coco_dataset)))


def test_two_replica_step_matches_single(coco_dataset):
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                  feat_channels=16, stacked_convs=1, num_base_anchors=9),
    )
    det_cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = retina_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    # each rank produces its own local batch; the global batch is their concat
    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    # single-device reference on the full global batch
    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    # 2-replica data-parallel mesh on the same global batch
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_two_stage_step_matches_single(coco_dataset):
    """Two-stage (Faster R-CNN) DP-sharded train step == single-device step.

    VERDICT r2 weak #5: the two-stage path (RoI sampling + RoIAlign gather
    across the data axis) had zero multi-device coverage.  Off-TPU the RoI
    stage runs the fused-jnp impl — this validates the GSPMD sharding
    structure; the Pallas kernel itself is covered by the TPU tests.
    """
    from torch_detection_tpu.models.detectors import (
        FasterRCNNConfig,
        TwoStageDetector,
        faster_rcnn_loss,
    )
    from torch_detection_tpu.models.heads import ProposalConfig

    model = TwoStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
    )
    det_cfg = FasterRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        proposal_test=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        rpn_num_samples=32,
        rcnn_num_samples=16,
        max_detections=8,
    )

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        losses = faster_rcnn_loss(det_cfg, model, variables, batch, rng)
        return losses["loss"], {"loss_rpn_cls": losses["loss_rpn_cls"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    roi_feats = jnp.zeros((1, 8, 7, 7, 16), jnp.float32)
    vars2 = model.init(jax.random.PRNGKey(1), roi_feats, method=TwoStageDetector.roi_forward)
    variables = {
        "params": {**variables["params"], **vars2["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_cascade_step_matches_single(coco_dataset):
    """Cascade R-CNN DP-sharded train step == single-device step: the
    three-stage refined-slate loop (per-stage assign/sample/RoIAlign) under
    GSPMD must match the unsharded program bit-for-tolerance."""
    from torch_detection_tpu.models.detectors import (
        CascadeRCNN,
        CascadeRCNNConfig,
        cascade_rcnn_loss,
    )
    from torch_detection_tpu.models.heads import ProposalConfig

    model = CascadeRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
        num_stages=3,
    )
    det_cfg = CascadeRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        proposal_test=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        rpn_num_samples=32,
        rcnn_num_samples=16,
        max_detections=8,
    )

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        losses = cascade_rcnn_loss(det_cfg, model, variables, batch, rng)
        return losses["loss"], {"loss_s2_cls": losses["loss_s2_cls"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    roi_feats = jnp.zeros((1, 8, 7, 7, 16), jnp.float32)
    vars2 = model.init(
        jax.random.PRNGKey(1), roi_feats, method=CascadeRCNN.roi_forward_all
    )
    variables = {
        "params": {**variables["params"], **vars2["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    # looser than the FRCNN test: GSPMD reassociation perturbs proposal
    # scores ~1e-6, and the cascade's discrete per-stage IoU thresholds can
    # flip a handful of roi assignments between the two programs — measured
    # max param delta 2.3e-4 after one lr=0.01 step, loss identical to 2e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_atss_step_matches_single(coco_dataset):
    """ATSS DP-sharded train step == single-device step: the adaptive
    assigner's per-level top-k + IoU mean/std statistics are per-image, so
    data sharding must be bit-stable modulo GSPMD reassociation."""
    from torch_detection_tpu.models.detectors import ATSSConfig, atss_loss
    from torch_detection_tpu.ops.assign import ATSSAssigner

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="ATSSHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    det_cfg = ATSSConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(1.0,),
            octave_base_scale=8.0, scales_per_octave=1,
        ),
        assigner=ATSSAssigner(topk=4),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg, ctr = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = atss_loss(
            det_cfg, cls, reg, ctr, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_yolo_step_matches_single(coco_dataset):
    """YOLOv3 DP-sharded train step == single-device step: grid-responsible
    anchor assignment is per-image, so the sharded loss must match the
    unsharded one modulo GSPMD reassociation."""
    from torch_detection_tpu.models.detectors import YOLOV3Config, yolo_loss
    from torch_detection_tpu.ops.anchors import YOLOAnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="Darknet", depth=53, stages=(1, 1, 1, 1, 1),
                      base_channels=8, out_indices=(2, 3, 4)),
        neck=dict(type="YOLOV3Neck", in_channels=(64, 128, 256),
                  out_channels=(64, 32, 16)),
        head=dict(type="YOLOV3Head", num_classes=2, anchors_per_level=1,
                  in_channels=(64, 32, 16), out_channels=(128, 64, 32)),
    )
    det_cfg = YOLOV3Config(
        num_classes=2,
        anchor_generator=YOLOAnchorGenerator(
            strides=(32, 16, 8),
            base_sizes=(((48.0, 48.0),), ((24.0, 24.0),), ((12.0, 12.0),)),
        ),
    )

    def loss_fn(params, batch_stats, batch):
        pred_maps = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = yolo_loss(
            det_cfg, pred_maps, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_conf": losses["loss_conf"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_centernet_step_matches_single(coco_dataset):
    """CenterNet DP-sharded train step == single-device step: the scanned
    Gaussian heatmap targets are per-image, so data sharding must match the
    unsharded loss modulo GSPMD reassociation."""
    from torch_detection_tpu.models.detectors import CenterNetConfig, centernet_loss

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
        neck=dict(type="CTResNetNeck", in_channels=512,
                  num_deconv_filters=(32, 16, 16)),
        head=dict(type="CenterNetHead", num_classes=2, in_channels=16,
                  feat_channels=16),
    )
    det_cfg = CenterNetConfig(num_classes=2)

    def loss_fn(params, batch_stats, batch):
        heat, wh, off = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = centernet_loss(
            det_cfg, heat, wh, off, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_heatmap": losses["loss_heatmap"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_true_multiprocess_distributed_step(coco_dataset, tmp_path):
    """TRUE multi-process distributed training (VERDICT r3 missing #1).

    Two OS processes, each with ONE local CPU device, form a 2-process JAX
    distributed service (gloo collectives) — the 2-device data mesh genuinely
    spans process boundaries, like one-chip-per-host TPU pods.  Each process
    derives its DistributedGroupSampler rank from ``jax.process_index()``,
    assembles the global batch from its LOCAL shard only
    (``shard_batch`` -> ``make_array_from_process_local_data``), and runs one
    DP train step.  Asserts: (a) post-step params bitwise-identical across
    the two processes, (b) equal (to DP-psum tolerance) to a single-process
    step on the concatenated global batch, (c) each worker's auto-derived
    sampler shard equals the explicit (rank, num_replicas=2) shard.

    Reference analog proven end to end: the per-rank loader slice at
    /root/reference/datasets/loader/dataset_sampler.py:94-171 feeding DP.
    """
    import socket
    import subprocess
    import sys

    from data_fixtures import make_coco

    root = str(tmp_path / "mp_data")
    make_coco(root)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    # the workers use ONE local device each; drop the 8-virtual-device flag
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    outs = [str(tmp_path / f"rank{r}.npz") for r in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(port), root, outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    res = [dict(np.load(o)) for o in outs]

    # (a) the replicated post-step params must agree bitwise across processes
    # (sampler indices are per-rank by design — that's the data shard)
    for k in res[0]:
        if k != "__sampler_indices__":
            np.testing.assert_array_equal(res[0][k], res[1][k], err_msg=k)

    # (c) auto-derived shards == explicit-rank shards (same seed)
    for r in (0, 1):
        explicit = list(iter(_replica_loader(coco_dataset, r).sampler))
        assert res[r]["__sampler_indices__"].tolist() == explicit

    # (b) single-process reference on the concatenated global batch
    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                  feat_channels=16, stacked_convs=1, num_base_anchors=9),
    )
    det_cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = retina_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)
    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    assert float(res[0]["__loss__"]) == pytest.approx(float(m1["loss"]), rel=2e-5)
    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(s1.params))[0]
    single = {"/".join(str(k) for k in path): np.asarray(v) for path, v in flat}
    for k, v in single.items():
        np.testing.assert_allclose(res[0][k], v, rtol=2e-4, atol=2e-6, err_msg=k)


def _dp_parity_check(loss_fn, variables, global_batch, rtol=2e-4, atol=2e-6):
    """Shared DP-parity runner: one SGD step single-device vs 2-replica
    sharded on the SAME global batch; loss and post-step params must agree
    modulo GSPMD reassociation."""
    tx = optax.sgd(0.01, momentum=0.9)
    batch_stats = variables.get("batch_stats", {})

    s1 = create_train_state(variables["params"], tx, batch_stats=batch_stats)
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, batch_stats)
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=rtol, atol=atol
        ),
        s1.params, jax.device_get(s2.params),
    )
    return m1, m2


def _global_batch_from_ranks(dataset, **loader_kw):
    local = []
    for rank in (0, 1):
        loader = build_dataloader(
            dataset, dist=True, num_replicas=2, rank=rank, seed=11,
            prefetch=0, **loader_kw,
        )
        batch = next(iter(loader))
        batch.pop("img_meta", None)
        local.append(batch)
    return {k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]}


def test_two_replica_ssd_step_matches_single(coco_dataset):
    """SSD DP parity (VERDICT r3 weak #5): OHEM hard-negative mining ranks
    losses PER IMAGE, so data sharding must not change the mined set."""
    from torch_detection_tpu.models.detectors import SSDConfig, ssd_loss
    from torch_detection_tpu.ops.anchors import SSDAnchorGenerator

    model = SingleStageDetector(
        backbone=dict(type="SSDVGG", depth=16),
        neck=None,
        head=dict(
            type="SSDHead", num_classes=2,
            in_channels=(512, 1024, 512, 256, 256, 256),
            anchors_per_level=(4, 6, 6, 6, 4, 4),
        ),
    )
    det_cfg = SSDConfig(
        num_classes=2,
        anchor_generator=SSDAnchorGenerator(
            strides=(8, 16, 32, 64, 100, 300),
            min_sizes=(21.0, 45.0, 99.0, 153.0, 207.0, 261.0),
            max_sizes=(45.0, 99.0, 153.0, 207.0, 261.0, 315.0),
        ),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply({"params": params}, batch["image"], train=True)
        losses = ssd_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=1, max_gts=8, canvas=(300, 300),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, {"params": variables["params"]}, global_batch)


def test_two_replica_fcos_step_matches_single(coco_dataset):
    """FCOS DP parity: per-point min-area assignment and centerness targets
    are per-image, so the sharded anchor-free loss must match unsharded."""
    from torch_detection_tpu.models.detectors import FCOSConfig, fcos_loss

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                  num_outs=5, add_extra_convs=True, extra_convs_on_inputs=True,
                  relu_before_extra_convs=True),
        head=dict(type="FCOSHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    det_cfg = FCOSConfig(num_classes=2)

    def loss_fn(params, batch_stats, batch):
        cls, reg, ctr = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = fcos_loss(
            det_cfg, cls, reg, ctr, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_fast_rcnn_step_matches_single(tmp_path):
    """Fast R-CNN DP parity: the fixed proposal slate rides the batch, so
    sharding splits (image, proposals) pairs together; roi sampling rngs
    fold per image index and must be shard-invariant."""
    from test_fast_rcnn import _synth_proposals
    from torch_detection_tpu.models.detectors import (
        FastRCNN,
        FastRCNNConfig,
        fast_rcnn_loss,
    )
    from torch_detection_tpu.utils.file_handler import dump

    root = str(tmp_path / "fr")
    ann_file, img_dir = make_coco(root)
    prop_file = str(tmp_path / "props.pkl")
    dump(_synth_proposals(ann_file), prop_file)
    dataset = get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        proposal_file=prop_file, num_max_proposals=16,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0,
    ))

    model = FastRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16,
                  num_outs=4),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
    )
    det_cfg = FastRCNNConfig(num_classes=2, rcnn_num_samples=16, max_detections=8)

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        losses = fast_rcnn_loss(det_cfg, model, variables, batch, rng)
        return losses["loss"], {"loss_rcnn_cls": losses["loss_rcnn_cls"]}

    global_batch = _global_batch_from_ranks(
        dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
        max_proposals=16,
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    roi_feats = jnp.zeros((1, 8, 7, 7, 16), jnp.float32)
    vars2 = model.init(jax.random.PRNGKey(1), roi_feats, method=FastRCNN.roi_forward)
    variables = {
        "params": {**variables["params"], **vars2["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_mask_rcnn_step_matches_single(tmp_path):
    """Mask R-CNN DP parity (the priority family per VERDICT r3 #5: its
    loss tier has the most sharding-sensitive gather/scatter — pyramid-
    routed mask targets, matched-channel dynamic slices, per-image roi
    sampling)."""
    from torch_detection_tpu.models.detectors import (
        MaskRCNN,
        MaskRCNNConfig,
        mask_rcnn_loss,
    )
    from torch_detection_tpu.models.heads import ProposalConfig

    root = str(tmp_path / "mr")
    ann_file, img_dir = make_coco(root)
    dataset = get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0, with_mask=True,
    ))

    model = MaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
        mask_head=dict(type="FCNMaskHead", num_classes=2, in_channels=16,
                       conv_channels=16, num_convs=1),
    )
    det_cfg = MaskRCNNConfig(
        num_classes=2,
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
        mask_num_rois=8,
    )

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        losses = mask_rcnn_loss(det_cfg, model, variables, batch, rng)
        return losses["loss"], {"loss_mask": losses["loss_mask"]}

    global_batch = _global_batch_from_ranks(
        dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    assert "gt_masks" in global_batch

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    roi_feats = jnp.zeros((1, 8, 7, 7, 16), jnp.float32)
    vars_roi = model.init(jax.random.PRNGKey(1), roi_feats, method=MaskRCNN.roi_forward)
    vars_mask = model.init(jax.random.PRNGKey(2), roi_feats, method=MaskRCNN.mask_forward)
    variables = {
        "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_cascade_mask_rcnn_step_matches_single(tmp_path):
    """Cascade Mask R-CNN DP parity: the per-stage mask tier (positives-
    first prefix slates + pyramid-routed mask targets, three times over
    progressively-refined rois) under GSPMD must match the unsharded
    program."""
    from torch_detection_tpu.models.detectors import (
        CascadeMaskRCNN,
        CascadeMaskRCNNConfig,
        cascade_mask_rcnn_loss,
    )
    from torch_detection_tpu.models.heads import ProposalConfig

    root = str(tmp_path / "cmr")
    ann_file, img_dir = make_coco(root)
    dataset = get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0, with_mask=True,
    ))

    model = CascadeMaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=32),
        mask_head=dict(type="FCNMaskHead", num_classes=2, in_channels=16,
                       conv_channels=16, num_convs=1),
        num_stages=3,
    )
    det_cfg = CascadeMaskRCNNConfig(
        num_classes=2,
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
        mask_num_rois=8,
    )

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        losses = cascade_mask_rcnn_loss(det_cfg, model, variables, batch, rng)
        return losses["loss"], {"loss_s2_mask": losses["loss_s2_mask"]}

    global_batch = _global_batch_from_ranks(
        dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    assert "gt_masks" in global_batch

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    roi_feats = jnp.zeros((1, 8, 7, 7, 16), jnp.float32)
    vars_roi = model.init(
        jax.random.PRNGKey(1), roi_feats, method=CascadeMaskRCNN.roi_forward_all
    )
    vars_mask = model.init(
        jax.random.PRNGKey(2), roi_feats, method=CascadeMaskRCNN.mask_forward_all
    )
    variables = {
        "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    # same tolerance story as the plain cascade DP test: discrete per-stage
    # IoU thresholds can flip a handful of roi assignments under GSPMD
    # reassociation
    _dp_parity_check(loss_fn, variables, global_batch, rtol=2e-3, atol=5e-4)


def test_two_replica_yolox_step_matches_single(coco_dataset):
    """YOLOX DP parity: SimOTA's per-image dynamic-k selection (top-k over
    the cost matrix + threshold compare) under GSPMD must match the
    unsharded program."""
    from torch_detection_tpu.models.detectors import (
        SingleStageDetector,
        YOLOXConfig,
        yolox_loss,
    )

    model = SingleStageDetector(
        backbone=dict(type="CSPDarknet", deepen_factor=0.33, widen_factor=0.125,
                      out_indices=(2, 3, 4)),
        neck=dict(type="YOLOXPAFPN", in_channels=(32, 64, 128), out_channels=32,
                  num_csp_blocks=1),
        head=dict(type="YOLOXHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    det_cfg = YOLOXConfig(num_classes=2, max_detections=8)

    def loss_fn(params, batch_stats, batch):
        cls, reg, obj = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            train=True,
        )
        losses = yolox_loss(
            det_cfg, cls, reg, obj, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_obj": losses["loss_obj"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_solov2_step_matches_single(tmp_path):
    """SOLOv2 DP parity: grid-cell targets from per-image mass centers,
    the positives-first mask slate, and the dynamic-conv matmul under
    GSPMD must match the unsharded program."""
    from torch_detection_tpu.models.detectors import (
        SOLOV2,
        SOLOV2Config,
        solov2_loss,
    )

    root = str(tmp_path / "solo")
    ann_file, img_dir = make_coco(root)
    dataset = get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0, with_mask=True,
    ))

    model = SOLOV2(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        head=dict(type="SOLOV2Head", num_classes=2, in_channels=16, feat_channels=16,
                  kernel_channels=8, stacked_convs=1, grid_numbers=(12, 10, 8, 6, 4),
                  norm_groups=4),
        mask_feat_head=dict(type="MaskFeatHead", in_channels=16, feat_channels=16,
                            out_channels=8, num_inputs=4, norm_groups=4),
    )
    det_cfg = SOLOV2Config(
        num_classes=2, grid_numbers=(12, 10, 8, 6, 4),
        scale_ranges=((1, 48), (24, 96), (48, 128), (96, 192), (128, 512)),
        max_pos_cells=32, pre_nms_top_k=16, max_detections=8,
    )

    def loss_fn(params, batch_stats, batch, step=0):
        variables = {"params": params, "batch_stats": batch_stats}
        cls, kern, mfeat = model.apply(variables, batch["image"], train=True)
        losses = solov2_loss(
            det_cfg, cls, kern, mfeat, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], batch["gt_masks"],
        )
        return losses["loss"], {"loss_mask": losses["loss_mask"]}

    global_batch = _global_batch_from_ranks(
        dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    assert "gt_masks" in global_batch

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_fsdp_sharding_rule_specs():
    """The ZeRO rule shards the largest divisible dim of big leaves over
    ``data``, leaves small leaves replicated, and composes with the TP rule."""
    from jax.sharding import PartitionSpec as P

    from torch_detection_tpu.parallel.mesh import make_mesh, param_sharding_rules

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    rule = param_sharding_rules(mesh, fsdp=True)

    conv = np.zeros((3, 3, 512, 64), np.float32)     # big: shard I over data, O over model
    assert rule(conv).spec == P(None, None, "data", "model")
    fc = np.zeros((12544, 33), np.float32)           # O=33 not /2: only data dim 0
    assert rule(fc).spec == P("data", None)
    bias = np.zeros((512,), np.float32)              # small: replicated
    assert rule(bias).spec == P()
    odd = np.zeros((3, 3, 127, 126), np.float32)     # no dim divisible by 4; O%2==0 -> model only
    assert rule(odd).spec == P(None, None, None, "model")

    # fsdp=False must reproduce the old TP-only rule
    rule0 = param_sharding_rules(mesh, fsdp=False)
    assert rule0(conv).spec == P(None, None, None, "model")
    assert rule0(fc).spec == P()


def test_fsdp_step_matches_single(coco_dataset):
    """ZeRO-3 sharded step (params+opt_state 1/N per device over ``data``)
    must match the single-device step bit-for-tolerance, and the state must
    actually live sharded between steps."""
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                  feat_channels=16, stacked_convs=1, num_base_anchors=9),
    )
    det_cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = retina_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    with mesh:
        params = shard_params(mesh, variables["params"], fsdp=True)
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(
            loss_fn, tx, mesh=mesh, donate_state=False, fsdp=True
        )(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

        # the state really is ZeRO-sharded between steps: a big conv kernel
        # leaf holds 1/4 of its elements per device, for params AND momentum
        big = s2.params["backbone"]["layer4_0"]["block1"]["conv"]["kernel"]
        assert "data" in tuple(big.sharding.spec)
        n_local = big.addressable_shards[0].data.size
        assert n_local * 4 == big.size
        mom = jax.tree_util.tree_leaves(
            s2.opt_state, is_leaf=lambda x: isinstance(x, jax.Array)
        )
        assert any(
            isinstance(m, jax.Array) and m.size >= 8192
            and m.addressable_shards[0].data.size * 4 == m.size
            for m in mom
        )

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    # reduce-scatter + all-gather reassociates the gradient sum slightly
    # differently from plain-DP psum: allow a touch more than the DP tests
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=8e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_spatial_partition_matches_single(coco_dataset):
    """Sequence-parallel analog (SURVEY §5): image rows sharded over the
    ``model`` axis.  GSPMD spatially partitions the convs (halo exchange via
    collective-permute); the forward and a full train step must match the
    unsharded graph."""
    from torch_detection_tpu.parallel.mesh import replicated, spatial_sharding

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                  feat_channels=16, stacked_convs=1, num_base_anchors=9),
    )
    det_cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = retina_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    batch = next(iter(_replica_loader(coco_dataset, 0)))
    batch.pop("img_meta", None)

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    outs1 = jax.jit(model.apply)(variables, jnp.asarray(batch["image"]))

    tx = optax.sgd(0.01, momentum=0.9)
    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    _, m1 = step1(s1, {k: jnp.asarray(v) for k, v in batch.items()})

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    with mesh:
        vrep = jax.device_put(variables, replicated(mesh))
        xs = jax.device_put(np.asarray(batch["image"]), spatial_sharding(mesh))
        # rows really are banded over the model axis before the forward
        assert xs.addressable_shards[0].data.shape[1] * 4 == xs.shape[1]
        outs2 = jax.jit(model.apply)(vrep, xs)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            outs1, jax.device_get(outs2),
        )

        # full train step on a spatially-sharded batch (conv bwd under halo)
        s2 = create_train_state(
            vrep["params"], tx, batch_stats=vrep["batch_stats"]
        )
        step2 = make_train_step(loss_fn, tx, donate_state=False)
        _, m2 = step2(s2, shard_batch(mesh, batch, spatial=True))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-4)


def test_two_replica_foveabox_step_matches_single(coco_dataset):
    """FoveaBox DP parity: fovea-region assignment and log-space targets
    are per-image, so the sharded anchor-free loss must match unsharded."""
    from torch_detection_tpu.models.detectors import FoveaConfig, fovea_loss

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                  num_outs=5, add_extra_convs=True, extra_convs_on_inputs=True,
                  relu_before_extra_convs=True),
        head=dict(type="FoveaHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    det_cfg = FoveaConfig(num_classes=2)

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = fovea_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_gfl_step_matches_single(coco_dataset):
    """GFL DP-sharded train step == single-device step (QFL/DFL targets are
    per-image; sharding the batch must only change GSPMD reassociation)."""
    from torch_detection_tpu.models.detectors import GFLConfig, gfl_loss

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="GFLHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1, reg_max=8),
    )
    det_cfg = GFLConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(1.0,),
            octave_base_scale=8.0, scales_per_octave=1,
        ),
        reg_max=8,
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = gfl_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_qfl": losses["loss_qfl"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.sgd(0.01, momentum=0.9)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_detr_step_matches_single(coco_dataset):
    """DETR DP-sharded train step == single-device step: the Hungarian
    matching (fixed-shape while_loops) is per-image, so GSPMD runs each
    device's matchings locally and only the gradient psum crosses chips."""
    from torch_detection_tpu.models.detectors import DETR, DETRConfig, detr_loss

    model = DETR(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(2,)),
        num_classes=2, d_model=32, nhead=4, num_encoder_layers=1,
        num_decoder_layers=1, dim_feedforward=64, num_queries=8,
    )
    det_cfg = DETRConfig(num_classes=2, num_queries=8)

    def loss_fn(params, batch_stats, batch):
        shapes = batch["img_shape"].astype(jnp.float32)
        cls, box = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            img_shapes=shapes, train=True,
        )
        losses = detr_loss(
            det_cfg, cls, box, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=shapes,
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    local = []
    for rank in (0, 1):
        batch = next(iter(_replica_loader(coco_dataset, rank)))
        batch.pop("img_meta", None)
        local.append(batch)
    global_batch = {
        k: np.concatenate([local[0][k], local[1][k]]) for k in local[0]
    }

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = optax.adam(1e-3)

    s1 = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step1 = make_train_step(loss_fn, tx, donate_state=False)
    s1, m1 = step1(s1, {k: jnp.asarray(v) for k, v in global_batch.items()})

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    with mesh:
        params = shard_params(mesh, variables["params"])
        stats = shard_params(mesh, variables["batch_stats"])
        s2 = create_train_state(params, tx, batch_stats=stats)
        step2 = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(s2)
        s2, m2 = step2(s2, shard_batch(mesh, global_batch))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-5)
    # adam's step-1 update is ~sign(g)*lr: for near-zero grads the sign
    # itself flips on GSPMD psum reassociation noise, so bound the ABSOLUTE
    # deviation by a fraction of the 1e-3 step instead of a relative check
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        ),
        s1.params, jax.device_get(s2.params),
    )


def test_two_replica_free_anchor_step_matches_single(coco_dataset):
    """FreeAnchor DP parity: the bag likelihood normalizes by the GLOBAL
    positive count (sum over the batch), so under a data mesh the per-shard
    pos/neg sums must psum before the division — GSPMD gets this right only
    if the loss is written over the global batch, which this asserts."""
    from torch_detection_tpu.models.detectors import (
        FreeAnchorConfig,
        free_anchor_loss,
    )

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                  feat_channels=16, stacked_convs=1, num_base_anchors=2),
    )
    det_cfg = FreeAnchorConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0),
            octave_base_scale=4.0, scales_per_octave=1,
        ),
        target_stds=(0.1, 0.1, 0.2, 0.2),
        pre_anchor_topk=8,
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = free_anchor_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"],
        )
        return losses["loss"], {"loss_pos": losses["loss_pos"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_multiprocess_training_through_cli(tmp_path):
    """Multi-process training through the USER-FACING CLI (VERDICT r4
    missing #1): launch ``tools/train.py`` itself as 2 OS processes over a
    gloo coordinator (the JAX_COORDINATOR_ADDRESS env path,
    parallel/distributed.py), run 2 epochs with validation + checkpointing
    on, and assert

    * process-0-only artifacts: epoch checkpoints, best/, metrics.jsonl in
      rank 0's work_dir; rank 1's work_dir untouched,
    * final params bitwise-identical across the two processes,
    * parity with a single-process run of the same config (same global
      batch per step: the golden set is one aspect group and each epoch is
      exactly one all-images step, so only GSPMD/psum reassociation and
      in-batch order differ -> rtol).

    Reference analog: the per-rank loader slice at
    /root/reference/datasets/loader/dataset_sampler.py:94-171 feeding a
    real multi-rank run end to end (the reference never ran its own
    launcher tier; this proves ours through the CLI).
    """
    import socket
    import subprocess
    import sys

    from data_fixtures import make_golden_coco

    ann_file, img_dir = make_golden_coco(str(tmp_path / "golden"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    cfg_tmpl = """
num_classes = 2
model = dict(
    type="SingleStageDetector",
    backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
    neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=16, num_outs=3),
    head=dict(type="RetinaHead", num_classes=num_classes, in_channels=16,
              feat_channels=16, stacked_convs=1, num_base_anchors=9),
)
detection = dict(
    num_classes=num_classes,
    anchor=dict(strides=(8, 16, 32)),
    max_detections=10,
    pre_nms_top_k=50,
)
data = dict(
    train=dict(
        type="CocoDataset", ann_file={ann!r}, img_prefix={img!r},
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(64, 64),
        size_divisor=32, flip_ratio=0.0,
    ),
    val=dict(
        type="CocoDataset", ann_file={ann!r}, img_prefix={img!r},
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(64, 64),
        size_divisor=32, test_mode=True,
    ),
    sample_per_replica=4,
    max_gts=4,
    canvas=(64, 64),
)
optimizer = dict(lr=0.001, momentum=0.9, weight_decay=0.0, grad_clip_norm=35.0)
schedule = dict(total_epochs=2, warmup_steps=0)
runtime = dict(work_dir="unused", log_interval=1, mesh=dict(model=1),
               val_interval_epochs=1, val_batch=4, checkpoint_interval_epochs=1)
"""
    cfg_path = str(tmp_path / "mp_cli.py")
    with open(cfg_path, "w") as f:
        f.write(cfg_tmpl.format(ann=ann_file, img=img_dir))

    def base_env(n_local_devices):
        env = dict(os.environ)
        env["JAX_PLATFORM_NAME"] = "cpu"  # wins over sitecustomize's axon
        env["XLA_FLAGS"] = " ".join(
            [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
            + [f"--xla_force_host_platform_device_count={n_local_devices}"]
        )
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/td_jax_cache")
        return env

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    train = os.path.join(repo, "tools", "train.py")
    works = [str(tmp_path / f"work_r{r}") for r in (0, 1)]
    dump_mp = str(tmp_path / "mp_final")
    procs = []
    for r in (0, 1):
        env = base_env(1)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(r),
        )
        procs.append(subprocess.Popen(
            [sys.executable, train, cfg_path, "--work-dir", works[r],
             "--dump-final", dump_mp],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n\n".join(logs)

    # process-0-only artifacts
    assert os.path.isdir(os.path.join(works[0], "epoch_1")), logs[0][-2000:]
    assert os.path.isdir(os.path.join(works[0], "epoch_2"))
    assert os.path.isdir(os.path.join(works[0], "best"))
    metrics_path = os.path.join(works[0], "metrics.jsonl")
    assert os.path.exists(metrics_path)
    import json as _json

    records = [_json.loads(l) for l in open(metrics_path) if l.strip()]
    assert any(any(k.startswith("val_") for k in r) for r in records)
    assert not os.path.exists(os.path.join(works[1], "metrics.jsonl"))
    assert not os.path.isdir(os.path.join(works[1], "epoch_1"))

    # replicas bitwise-identical across process boundaries
    r0 = dict(np.load(dump_mp + ".rank0.npz"))
    r1 = dict(np.load(dump_mp + ".rank1.npz"))
    assert set(r0) == set(r1) and len(r0) > 0
    for k in r0:
        np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)

    # single-process reference: same config, 2 local devices = same global
    # batch (all 8 golden images) per step
    dump_sp = str(tmp_path / "sp_final")
    res = subprocess.run(
        [sys.executable, train, cfg_path,
         "--work-dir", str(tmp_path / "work_sp"), "--dump-final", dump_sp],
        env=base_env(2), cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    sp = dict(np.load(dump_sp + ".rank0.npz"))
    assert set(sp) == set(r0)
    for k in r0:
        np.testing.assert_allclose(r0[k], sp[k], rtol=2e-4, atol=3e-6, err_msg=k)


def test_two_replica_sparse_rcnn_step_matches_single(coco_dataset):
    """Sparse R-CNN DP parity: per-image Hungarian matching + per-stage
    RoIAlign over the learnable proposal slate must stay shard-local —
    the sharded step's loss and post-step params match unsharded."""
    from torch_detection_tpu.models.detectors import (
        SparseRCNN,
        SparseRCNNConfig,
        sparse_rcnn_loss,
    )

    model = SparseRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512),
                  out_channels=32, num_outs=4),
        num_proposals=8, num_stages=2, num_classes=2, d_model=32, nhead=4,
        dim_feedforward=64, dynamic_dim=16, roi_strides=(4, 8, 16, 32),
    )
    det_cfg = SparseRCNNConfig(num_classes=2, num_proposals=8)

    def loss_fn(params, batch_stats, batch):
        shapes = batch["img_shape"].astype(jnp.float32)
        cls, box = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            img_shapes=shapes, train=True,
        )
        losses = sparse_rcnn_loss(
            det_cfg, cls, box, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=shapes,
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)


def test_two_replica_paa_step_matches_single(coco_dataset):
    """PAA DP parity: the GMM reassignment (fixed-shape EM vmapped over
    batch x gt) is per-image, so the sharded loss must match unsharded —
    this also proves the EM's lax loops stay shard-local under GSPMD."""
    from torch_detection_tpu.models.detectors import PAAConfig, paa_loss

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=32,
                  num_outs=5, add_extra_convs=True, extra_convs_on_inputs=True,
                  relu_before_extra_convs=True),
        head=dict(type="PAAHead", num_classes=2, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )
    det_cfg = PAAConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(1.0,),
            octave_base_scale=8.0, scales_per_octave=1,
        ),
        topk=4,
    )

    def loss_fn(params, batch_stats, batch):
        cls, reg, iou_p = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = paa_loss(
            det_cfg, cls, reg, iou_p, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    global_batch = _global_batch_from_ranks(
        coco_dataset, sample_per_replica=2, max_gts=8, canvas=(128, 128),
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3), jnp.float32)
    )
    _dp_parity_check(loss_fn, variables, global_batch)
