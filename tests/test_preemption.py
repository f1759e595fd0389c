"""Preemption-safe training: mid-epoch step checkpoints + deterministic
batch-position resume (SURVEY.md §5 elastic recovery — the reference had no
trainer at all, so this subsystem is TPU-era design: a SIGTERM finishes the
in-flight step, saves ``step_<n>`` with the exact (epoch, batch) position,
and a relaunched job replays NOTHING and skips NOTHING: interrupted+resumed
must equal uninterrupted bit-for-bit)."""

import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from data_fixtures import make_golden_coco

from torch_detection_tpu.data import build_dataloader, get_datasets
from torch_detection_tpu.engine import (
    Trainer,
    latest_checkpoint,
    load_checkpoint_file,
    rebuild_opt_state,
)
from torch_detection_tpu.models.detectors import (
    RetinaNetConfig,
    SingleStageDetector,
    retina_loss,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator
from torch_detection_tpu.parallel import TrainState


@pytest.fixture(scope="module")
def golden_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("preempt"))
    ann_file, img_dir = make_golden_coco(root, n_images=8, size=64)
    return get_datasets(dict(
        type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(64, 64),
        size_divisor=32, flip_ratio=0.0,
    ))


def _loader(dataset, **kw):
    return build_dataloader(
        dataset, sample_per_replica=2, seed=3, max_gts=4, canvas=(64, 64),
        prefetch=0, **kw,
    )


def test_iter_batches_skip_matches_tail_without_decoding(golden_dataset):
    loader = _loader(golden_dataset)
    loader.set_epoch(0)
    full = list(loader)

    calls = []
    orig = type(golden_dataset).__getitem__

    class Counting:
        def __init__(self, ds):
            self._ds = ds

        def __getattr__(self, name):
            return getattr(self._ds, name)

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            calls.append(i)
            return orig(self._ds, i)

    loader2 = _loader(Counting(golden_dataset))
    loader2.set_epoch(0)
    tail = list(loader2.iter_batches(skip_batches=2))

    assert len(tail) == len(full) - 2
    # skipped batches were never decoded
    assert len(calls) == sum(b["image"].shape[0] for b in tail)
    for got, want in zip(tail, full[2:]):
        for k in want:
            if k == "img_meta":
                continue
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def _make_setup(dataset):
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=8,
                  num_outs=5, add_extra_convs=True),
        head=dict(type="RetinaHead", num_classes=2, in_channels=8,
                  feat_channels=8, stacked_convs=1, num_base_anchors=9),
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

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    tx = optax.sgd(0.05, momentum=0.9)
    return loss_fn, variables, tx


def test_sigterm_preempt_then_resume_equals_uninterrupted(golden_dataset, tmp_path):
    loss_fn, variables, tx = _make_setup(golden_dataset)
    # the train step donates its state buffers; each Trainer needs its own copy
    fresh = lambda: jax.tree_util.tree_map(jnp.copy, variables)

    # ---- uninterrupted single-epoch run (4 batches) ----
    t_ref = Trainer(
        loss_fn, fresh(), tx, _loader(golden_dataset),
        work_dir=str(tmp_path / "ref"), log_interval=100,
        checkpoint_interval_epochs=100,
    )
    s_ref = t_ref.run(1)
    assert int(s_ref.step) == 4

    # ---- preempted run: SIGTERM lands during batch 2 ----
    work = str(tmp_path / "pre")
    t_pre = Trainer(
        loss_fn, fresh(), tx, _loader(golden_dataset),
        work_dir=work, log_interval=100, checkpoint_interval_epochs=100,
        handle_preemption=True,
    )
    orig_step = t_pre.train_step
    count = []

    def stepping(state, batch):
        count.append(1)
        if len(count) == 2:
            os.kill(os.getpid(), signal.SIGTERM)  # exercised via the handler
        return orig_step(state, batch)

    t_pre.train_step = stepping
    s_pre = t_pre.run(1)
    assert t_pre.preempted
    assert int(s_pre.step) == 2

    ckpt = latest_checkpoint(work)
    assert ckpt is not None and os.path.basename(ckpt) == "step_2"
    payload = load_checkpoint_file(ckpt)
    meta = payload["meta"]
    assert meta["epoch"] == 0 and meta["batches_done"] == 2 and meta["step"] == 2

    # ---- fresh process analog: rebuild state from the checkpoint, resume ----
    t_res = Trainer(
        loss_fn, fresh(), tx, _loader(golden_dataset),
        work_dir=work, log_interval=100, checkpoint_interval_epochs=100,
    )
    restored = payload["variables"]
    opt_state = tx.init(restored["params"])
    if "opt_state" in payload:
        opt_state = rebuild_opt_state(opt_state, payload["opt_state"])
    t_res.state = TrainState(
        step=jnp.asarray(meta["step"], jnp.int32),
        params=restored["params"],
        opt_state=opt_state,
        batch_stats=restored.get("batch_stats"),
    )
    s_res = t_res.run(1, start_epoch=meta["epoch"], skip_batches=meta["batches_done"])
    assert int(s_res.step) == 4

    # interrupted + resumed == uninterrupted, bit-for-bit
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(s_ref.params), jax.device_get(s_res.params),
    )
