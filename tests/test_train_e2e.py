"""End-to-end training smoke test: tiny COCO fixture -> loader -> sharded
train step -> checkpoint, all on the 8-device virtual CPU mesh."""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from data_fixtures import make_coco
from torch_detection_tpu.data import CocoDataset, build_dataloader
from torch_detection_tpu.engine import Trainer, detection_lr_schedule, load_checkpoint_file
from torch_detection_tpu.models.detectors import (
    RetinaNetConfig,
    SingleStageDetector,
    retina_loss,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator
from torch_detection_tpu.parallel import make_mesh, make_optimizer


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path, caplog):
    root = str(tmp_path / "coco")
    ann_file, img_dir = make_coco(root)
    ds = CocoDataset(
        ann_file=ann_file,
        img_prefix=img_dir,
        img_means=(0, 0, 0),
        img_stds=(1, 1, 1),
        img_expected_sizes=(100, 60),
        size_divisor=32,
        flip_ratio=0.5,
    )
    dl = build_dataloader(ds, sample_per_replica=2, max_gts=8, canvas=(128, 128))

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16, num_outs=5,
                  add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16, feat_channels=16,
                  stacked_convs=1, num_base_anchors=9),
    )
    cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(8, 16, 32, 64, 128)),
    )
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # host snapshot: training donates device buffers (device_put may alias)
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply({"params": params, "batch_stats": batch_stats}, batch["image"], train=True)
        losses = retina_loss(
            cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch["img_shape"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"], "loss_reg": losses["loss_reg"]}

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    sched = detection_lr_schedule(0.001, steps_per_epoch=2, total_epochs=2, warmup_steps=2)
    tx = make_optimizer(learning_rate=sched, grad_clip_norm=35.0)
    trainer = Trainer(
        loss_fn, variables, tx, dl, mesh=mesh,
        work_dir=str(tmp_path / "work"), log_interval=1,
        checkpoint_interval_epochs=1, max_keep_checkpoints=1,
    )
    state = trainer.run(num_epochs=2)
    assert int(state.step) >= 4
    assert all(np.isfinite(m["loss"]) for m in trainer.history)
    # params actually moved
    delta = jax.tree_util.tree_reduce(
        lambda a, p: a + float(np.abs(np.asarray(p[0]) - p[1]).sum()),
        jax.tree_util.tree_map(lambda a, b: (a, b), state.params, params0),
        0.0,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert delta > 0
    # checkpoint exists and carries meta
    payload = load_checkpoint_file(str(tmp_path / "work" / "epoch_2"))
    assert payload["meta"]["epoch"] == 2


@pytest.mark.slow
def test_trainer_ema_and_accumulation(tmp_path):
    """Trainer with ema_decay + accum_steps: checkpoints carry ema_params and
    the EMA tree lags the raw params."""
    root = str(tmp_path / "coco")
    ann_file, img_dir = make_coco(root)
    ds = CocoDataset(
        ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1),
        img_expected_sizes=(100, 60), size_divisor=32, flip_ratio=0.0,
    )
    dl = build_dataloader(ds, sample_per_replica=2, max_gts=8, canvas=(128, 128))

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16, num_outs=5,
                  add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=16, feat_channels=16,
                  stacked_convs=1, num_base_anchors=9),
    )
    cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(8, 16, 32, 64, 128)),
    )
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply({"params": params, "batch_stats": batch_stats}, batch["image"], train=True)
        losses = retina_loss(
            cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch["img_shape"],
        )
        return losses["loss"], {"loss_cls": losses["loss_cls"]}

    tx = make_optimizer(learning_rate=0.001, grad_clip_norm=35.0)
    trainer = Trainer(
        loss_fn, variables, tx, dl,
        work_dir=str(tmp_path / "work"), log_interval=1,
        checkpoint_interval_epochs=1, max_keep_checkpoints=1,
        ema_decay=0.9, accum_steps=2,
    )
    state = trainer.run(num_epochs=1)
    assert state.ema_params is not None
    # ema lags params (decay > 0 and params moved)
    diff = jax.tree_util.tree_reduce(
        lambda a, p: a + float(np.abs(np.asarray(p[0]) - np.asarray(p[1])).sum()),
        jax.tree_util.tree_map(lambda a, b: (a, b), state.ema_params, state.params),
        0.0,
        is_leaf=lambda x: isinstance(x, tuple),
    )
    assert diff > 0
    payload = load_checkpoint_file(str(tmp_path / "work" / "epoch_1"))
    assert "ema_params" in payload["variables"]
