#!/usr/bin/env python
"""Train a detector from a config file.

Usage: python tools/train.py configs/retinanet_r50_fpn_coco.py [--epochs N]
       [--work-dir DIR] [--resume CKPT] [--pretrained torch://w.pth]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="train a detector")
    parser.add_argument("config")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    parser.add_argument("--auto-resume", action="store_true",
                        help="resume from the latest epoch_N in work_dir if present")
    parser.add_argument("--pretrained", default=None, help="e.g. torch://resnet50.pth")
    parser.add_argument("--profile-dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dump-final", default=None, metavar="PATH",
        help="after training, write the final params as PATH.rank<k>.npz "
        "(one file PER PROCESS — lets a multi-process launch verify its "
        "replicas agree; also a quick way to inspect weights without orbax)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import jax
    import jax.numpy as jnp

    import numpy as np

    from torch_detection_tpu.builder import build_loss_fn, build_lr_schedule, build_train_objects
    from torch_detection_tpu.engine import Trainer, load_checkpoint, load_checkpoint_file
    from torch_detection_tpu.parallel import make_mesh
    from torch_detection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    runtime = cfg.get("runtime", {})
    work_dir = args.work_dir or runtime.get("work_dir", "work_dirs/default")
    total_epochs = args.epochs or cfg.get("schedule", {}).get("total_epochs", 12)

    # multi-host bring-up: no-op on a single host; on a pod every process
    # wires the ICI/DCN fabric here and the data tier shards by
    # jax.process_index() (build_dataloader's dist switch below)
    from torch_detection_tpu.parallel import init_distributed

    dist_info = init_distributed()

    mesh_cfg = runtime.get("mesh", {})
    mesh = make_mesh(model=mesh_cfg.get("model", 1))
    logging.info(
        "process %d/%d, mesh: %s over %d devices",
        dist_info["process_index"], dist_info["process_count"],
        dict(mesh.shape), len(jax.devices()),
    )

    # per-process loader share: the mesh's data axis spans ALL processes, but
    # each process only feeds its own local slice (shard_batch assembles the
    # global array from process-local shards on pods)
    local_data = mesh.shape["data"] // dist_info["process_count"]
    model, det_cfg, loader, tx = build_train_objects(cfg, data_parallel=local_data)

    canvas = tuple(cfg["data"].get("canvas") or (800, 1344))
    batch = cfg["data"].get("sample_per_replica", 2) * mesh.shape["data"]
    from torch_detection_tpu.builder import init_detector_variables

    x = jnp.zeros((batch, canvas[0], canvas[1], 3), jnp.float32)
    variables = init_detector_variables(
        model, det_cfg, cfg["model"], x, seed=args.seed
    )

    pretrained = args.pretrained or runtime.get("pretrained")
    if pretrained:
        variables, _ = load_checkpoint(variables, pretrained, strict=False)
        logging.info("loaded pretrained weights from %s", pretrained)

    loss_fn = build_loss_fn(model, det_cfg, rng_seed=args.seed)

    # in-training validation (runtime.val_interval_epochs > 0 enables it):
    # eval the val split every N epochs, keep the best-mAP checkpoint
    val_hook = None
    val_interval = int(runtime.get("val_interval_epochs", 0) or 0)
    if val_interval > 0 and cfg["data"].get("val"):
        from torch_detection_tpu.data import get_datasets
        from torch_detection_tpu.engine.validate import make_validation_hook

        val_cfg = dict(cfg["data"]["val"])
        sizes = val_cfg.get("img_expected_sizes")
        if isinstance(sizes, list):  # single-scale eval during training
            val_cfg["img_expected_sizes"] = sizes[0]
        val_cfg["flip_ratio"] = 0
        if runtime.get("val_segm"):
            val_cfg["with_mask"] = True  # gt masks needed for mask-IoU metrics
        val_hook = make_validation_hook(
            model, det_cfg, get_datasets(val_cfg),
            batch=int(runtime.get("val_batch", 8)), canvas=canvas,
            max_images=runtime.get("val_max_images"),
            voc_metric=bool(runtime.get("val_voc_metric", False)),
            segm=bool(runtime.get("val_segm", False)),
        )

    trainer = Trainer(
        loss_fn, variables, tx, loader, mesh=mesh,
        work_dir=work_dir,
        log_interval=runtime.get("log_interval", 50),
        checkpoint_interval_epochs=runtime.get("checkpoint_interval_epochs", 1),
        profile_dir=args.profile_dir,
        val_hook=val_hook,
        val_interval_epochs=val_interval or 1,
        ema_decay=runtime.get("ema_decay"),
        accum_steps=int(runtime.get("accum_steps", 1) or 1),
        fsdp=bool(runtime.get("fsdp", False)),
        checkpoint_interval_steps=runtime.get("checkpoint_interval_steps"),
        handle_preemption=bool(runtime.get("handle_preemption", True)),
        lr_schedule=build_lr_schedule(cfg, len(loader)),
    )
    start_epoch = 0
    skip_batches = 0
    if args.auto_resume and not args.resume:
        from torch_detection_tpu.engine import latest_checkpoint

        args.resume = latest_checkpoint(work_dir)
        if args.resume:
            logging.info("auto-resume found %s", args.resume)
    if args.resume:
        from torch_detection_tpu.engine import rebuild_opt_state
        from torch_detection_tpu.parallel import TrainState, shard_params

        payload = load_checkpoint_file(args.resume)
        meta = payload.get("meta", {})
        start_epoch = int(meta.get("epoch", 0))
        # mid-epoch (preemption) checkpoints carry the exact batch position;
        # the loader skips those batches without decoding them
        skip_batches = int(meta.get("batches_done", 0))
        logging.info(
            "resuming from %s at epoch %d batch %d",
            args.resume, start_epoch, skip_batches,
        )
        variables = payload["variables"]
        # Orbax's template-free restore loses optax's NamedTuple chain
        # (dicts/lists/None come back); rebuild it against a fresh tx.init
        # so tx.update and the sharding pytrees see the real structure.
        opt_state = tx.init(variables["params"])
        if "opt_state" in payload:
            opt_state = rebuild_opt_state(opt_state, payload["opt_state"])
        ema = variables.get("ema_params")
        if ema is None and runtime.get("ema_decay"):
            # resuming an EMA run from a pre-EMA checkpoint: seed from params
            ema = variables["params"]
        fsdp = trainer.fsdp
        trainer.state = TrainState(
            step=jnp.asarray(payload["meta"].get("step", 0), jnp.int32),
            params=shard_params(mesh, variables["params"], fsdp=fsdp),
            opt_state=shard_params(mesh, opt_state, fsdp=fsdp),
            batch_stats=shard_params(mesh, variables.get("batch_stats")) if variables.get("batch_stats") else None,
            ema_params=shard_params(mesh, ema, fsdp=fsdp) if ema is not None and runtime.get("ema_decay") else None,
        )

    trainer.run(
        total_epochs, start_epoch=start_epoch,
        skip_batches=skip_batches if args.resume else 0,
    )

    if args.dump_final:
        # every process dumps (not just main): a multi-process launch uses
        # the per-rank files to assert the replicated params stayed bitwise
        # identical across process boundaries
        flat = jax.tree_util.tree_flatten_with_path(
            jax.device_get(trainer.state.params)
        )[0]
        named = {"/".join(str(k) for k in p): np.asarray(v) for p, v in flat}
        out = f"{args.dump_final}.rank{dist_info['process_index']}.npz"
        np.savez(out, **named)
        logging.info("dumped final params to %s", out)

    # final summary from the persisted curve (work_dir/metrics.jsonl)
    if trainer.is_main and os.path.exists(trainer.metrics_path):
        import json

        records = [json.loads(l) for l in open(trainer.metrics_path) if l.strip()]
        steps = [r for r in records if "loss" in r]
        vals = [r for r in records if any(k.startswith("val_") for k in r)]
        if steps:
            last = steps[-1]
            logging.info(
                "run summary: %d logged windows, final loss %.4f @ step %d, "
                "mean %.1f img/s, %d skipped steps — curve at %s",
                len(steps), last.get("loss", float("nan")), int(last.get("step", 0)),
                float(np.mean([r.get("images_per_sec", 0.0) for r in steps])),
                int(last.get("skipped_steps", 0)), trainer.metrics_path,
            )
        if vals:
            best = max(vals, key=lambda r: r.get("val_mAP", float("-inf")))
            logging.info(
                "best val mAP %.4f at epoch %d",
                best.get("val_mAP", float("nan")), int(best.get("epoch", -1)),
            )


if __name__ == "__main__":
    main()
