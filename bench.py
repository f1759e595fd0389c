"""Benchmark harness (driver-run on real TPU).

Headline metric (BASELINE.md): end-to-end detection inference images/sec on a
single chip — ResNet-50 + FPN + RetinaHead forward + delta decode +
class-wise NMS on the COCO 800x1216 keep-ratio canvas, bf16 compute.

``vs_baseline`` is the ratio against the reference-equivalent CPU PyTorch
eager path (same architecture, same input), per BASELINE.json's ">=5x
CPU-PyTorch" north star.  The CPU denominator is measured once and cached in
``BASELINE_CPU.json`` (keyed by config) because it costs minutes on this
1-core host.

Prints exactly ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HW = (800, 1216)
# batch sweep on the warmed tunnel (r4): b32 232.0, b48 235.8, b64 234.9
# img/s — b48 is the throughput knee for this path on one v5e
BATCH = 48
NUM_CLASSES = 80
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json")
CACHE_KEY = f"torch_cpu_retina_r50_{HW[0]}x{HW[1]}"


def measure_torch_cpu() -> float:
    """Reference-equivalent eager PyTorch CPU path: images/sec."""
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import torch_refs

    torch.set_num_threads(os.cpu_count() or 1)

    class TorchFPN(torch.nn.Module):
        def __init__(self, in_channels=(512, 1024, 2048), out_channels=256):
            super().__init__()
            self.lateral = torch.nn.ModuleList(
                [torch.nn.Conv2d(c, out_channels, 1) for c in in_channels]
            )
            self.smooth = torch.nn.ModuleList(
                [torch.nn.Conv2d(out_channels, out_channels, 3, padding=1) for _ in in_channels]
            )
            self.extra1 = torch.nn.Conv2d(in_channels[-1], out_channels, 3, 2, 1)
            self.extra2 = torch.nn.Conv2d(out_channels, out_channels, 3, 2, 1)

        def forward(self, feats):
            lats = [l(f) for l, f in zip(self.lateral, feats)]
            for i in range(len(lats) - 1, 0, -1):
                lats[i - 1] = lats[i - 1] + torch.nn.functional.interpolate(
                    lats[i], size=lats[i - 1].shape[-2:], mode="nearest"
                )
            outs = [s(l) for s, l in zip(self.smooth, lats)]
            p6 = self.extra1(feats[-1])
            p7 = self.extra2(torch.nn.functional.relu(p6))
            return outs + [p6, p7]

    class TorchRetinaHead(torch.nn.Module):
        def __init__(self, channels=256, num_anchors=9, num_classes=NUM_CLASSES):
            super().__init__()
            self.cls_tower = torch.nn.Sequential(
                *[m for _ in range(4) for m in (torch.nn.Conv2d(channels, channels, 3, padding=1), torch.nn.ReLU())]
            )
            self.reg_tower = torch.nn.Sequential(
                *[m for _ in range(4) for m in (torch.nn.Conv2d(channels, channels, 3, padding=1), torch.nn.ReLU())]
            )
            self.cls_out = torch.nn.Conv2d(channels, num_anchors * num_classes, 3, padding=1)
            self.reg_out = torch.nn.Conv2d(channels, num_anchors * 4, 3, padding=1)

        def forward(self, feats):
            return (
                [self.cls_out(self.cls_tower(f)) for f in feats],
                [self.reg_out(self.reg_tower(f)) for f in feats],
            )

    backbone = torch_refs.torch_resnet50().eval()
    fpn = TorchFPN().eval()
    head = TorchRetinaHead().eval()

    x = torch.from_numpy(np.random.default_rng(0).normal(size=(1, 3, *HW)).astype(np.float32))
    with torch.no_grad():
        # warmup
        feats = backbone(x)[1:]
        cls, reg = head(fpn(feats))
        # timed
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            feats = backbone(x)[1:]
            cls, reg = head(fpn(feats))
            # decode proxy: sigmoid + top-k per level (cheap vs NMS; favors torch)
            for c in cls:
                torch.topk(c.sigmoid().reshape(-1), k=1000)
        dt = time.perf_counter() - t0
    return iters * 1 / dt


def get_cpu_baseline() -> float:
    if os.path.exists(CACHE_FILE):
        try:
            with open(CACHE_FILE) as f:
                cache = json.load(f)
            if CACHE_KEY in cache:
                return float(cache[CACHE_KEY])
        except Exception:
            cache = {}
    else:
        cache = {}
    val = measure_torch_cpu()
    cache[CACHE_KEY] = val
    with open(CACHE_FILE, "w") as f:
        json.dump(cache, f, indent=1)
    return val


def measure_tpu() -> float:
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/td_jax_cache_tpu")

    from __graft_entry__ import _build_model
    from torch_detection_tpu.models.detectors import RetinaNetConfig, decode_detections
    from torch_detection_tpu.ops.preprocess import (
        fused_normalize_pad_s2d,
        space_to_depth_2x2_np,
    )

    # stem_s2d matches the production retinanet config: the 2x2 space-to-depth
    # relayout rides the host wire (free numpy strided copy at canvas
    # placement) and the 7x7 s2 stem folds to 4x4 s1 on the (H/2,W/2,12)
    # canvas (r3: the XLA 7x7 stem is 14x off roofline at b8)
    model = _build_model(depth=50, feat_channels=256, num_classes=NUM_CLASSES,
                         dtype=jnp.bfloat16, stem_s2d=True)
    # approx_max_k candidate selection: ~9% e2e over exact top_k, recall
    # loss confined to tail-rank NMS candidates (see ops/nms.py docstring)
    cfg = RetinaNetConfig(num_classes=NUM_CLASSES, approx_top_k=True)

    # warm the device/tunnel before any timing
    float(jnp.sum(jnp.ones((8, 8))))

    x = jnp.zeros((BATCH, HW[0] // 2, HW[1] // 2, 12), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def infer(variables, x_u8, img_shapes, carry):
        # full production path: fused Pallas preprocessing (s2d u8 wire ->
        # normalized bf16, pad masked) -> backbone+FPN+head -> decode+NMS
        x = fused_normalize_pad_s2d(x_u8, img_shapes, out_dtype=jnp.bfloat16)
        cls, reg = model.apply(variables, x)
        d = decode_detections(cfg, cls, reg)
        # carry chains the iterations so ONE readback at the end forces all
        # executions to complete (the axon backend's block_until_ready does
        # not synchronize reliably; a per-iteration readback would add a
        # ~25ms tunnel round-trip to every step)
        return carry + jnp.sum(d.scores) + jnp.sum(d.boxes)

    rng = np.random.default_rng(0)
    host = rng.integers(0, 255, size=(BATCH, *HW, 3), dtype=np.uint8)
    host = space_to_depth_2x2_np(host)  # host wire relayout (free strided copy)
    xb = jax.device_put(jnp.asarray(host))
    shapes = jax.device_put(jnp.asarray([[HW[0], HW[1]]] * BATCH, jnp.int32))

    # warmup / compile (several steps: a freshly restarted axon tunnel can
    # run ~20% slow for the first seconds — observed 184 vs 222 img/s)
    acc = jnp.zeros(())
    for _ in range(3):
        acc = infer(variables, xb, shapes, acc)
    float(acc)

    iters = 20
    # Four timing windows; report the MEDIAN of the last three.  The first
    # window is extra warmup — a freshly restarted axon tunnel runs ~20%
    # slow for its first seconds — and the median (vs best-of-N, which
    # biases optimistic, or a single window, which moved +-3% with tunnel
    # state across rounds) makes the driver-visible number stable.
    windows = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(iters):
            acc = infer(variables, xb, shapes, acc)
        float(acc)
        dt = time.perf_counter() - t0
        windows.append(iters * BATCH / dt)
    return float(np.median(windows[1:]))


def main():
    cpu_ips = get_cpu_baseline()
    tpu_ips = measure_tpu()
    print(
        json.dumps(
            {
                "metric": "images/sec e2e RetinaNet-R50-FPN inference (800x1216, bf16, incl. NMS)",
                "value": round(tpu_ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(tpu_ips / max(cpu_ips, 1e-9), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
