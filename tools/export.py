#!/usr/bin/env python
"""Export a detector config (+ checkpoint) as a serving artifact.

    python tools/export.py configs/retinanet_r50_fpn_coco.py \
        --checkpoint work_dirs/retina/epoch_12 --out retina_serve.jaxexp \
        --batch 8 --canvas 800x1216 [--check]

The artifact is a serialized ``jax.export`` module with the weights baked
in (see ``torch_detection_tpu/engine/export.py``); load it anywhere with
``engine.load_serving(path)`` — no framework code needed at serving time.
``--check`` round-trips the file and compares its outputs against the live
model on random input.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax dir or torch://file.pth (default: random init)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--canvas", default=None, help="HxW (default: config canvas)")
    parser.add_argument("--check", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_detection_tpu.builder import build_detection_cfg, build_detector
    from torch_detection_tpu.engine import load_checkpoint
    from torch_detection_tpu.engine.export import (
        export_serving,
        load_serving,
        make_serving_fn,
        save_serving,
    )
    from torch_detection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    runtime = dict(cfg.get("runtime", {}))
    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        runtime.get("compute_dtype", "bfloat16")
    ]
    model = build_detector(cfg["model"], runtime.get("compute_dtype"))
    det_cfg = build_detection_cfg(cfg["detection"])

    canvas = (
        tuple(int(v) for v in args.canvas.split("x"))
        if args.canvas
        else tuple(cfg["data"].get("canvas") or (800, 1216))
    )

    from torch_detection_tpu.builder import init_detector_variables

    x = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, cfg["model"], x)
    if args.checkpoint:
        variables, _ = load_checkpoint(variables, args.checkpoint, strict=False)

    # Normalization stats live on the per-split dataset cfg (img_means /
    # img_stds under data.val / data.train) — not a top-level img_norm key.
    data_cfg = cfg.get("data", {})
    split = data_cfg.get("val", data_cfg.get("train", {})) or {}
    mean = tuple(split.get("img_means", (123.675, 116.28, 103.53)))
    std = tuple(split.get("img_stds", (58.395, 57.12, 57.375)))

    s2d_wire = bool(cfg["model"].get("backbone", {}).get("stem_s2d", False))
    exported = export_serving(
        model, det_cfg, variables, args.batch, canvas,
        mean=mean, std=std, compute_dtype=compute_dtype, s2d_wire=s2d_wire,
    )
    save_serving(exported, args.out)
    print(
        f"exported {args.config} -> {args.out} "
        f"(batch={args.batch}, canvas={canvas}, platform={exported.platforms})"
    )

    if args.check:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (args.batch, *canvas, 3), dtype=np.uint8)
        if s2d_wire:
            from torch_detection_tpu.ops.preprocess import space_to_depth_2x2_np

            img = space_to_depth_2x2_np(img)
        shp = np.tile(np.asarray([[canvas[0], canvas[1]]], np.int32), (args.batch, 1))
        sf = np.ones((args.batch,), np.float32)
        served = load_serving(args.out)(img, shp, sf)
        direct = jax.jit(
            make_serving_fn(model, det_cfg, variables, mean, std, compute_dtype,
                            s2d_wire=s2d_wire)
        )(jnp.asarray(img), jnp.asarray(shp), jnp.asarray(sf))
        for k in direct:
            np.testing.assert_allclose(
                np.asarray(served[k], np.float32),
                np.asarray(direct[k], np.float32),
                rtol=1e-5, atol=1e-5,
            )
        print(f"check ok: artifact matches the live model on {list(direct)}")


if __name__ == "__main__":
    main()
