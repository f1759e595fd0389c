"""Subprocess body for the true multi-process distributed training test.

Each OS process runs this script with its own ``process_id``; the pair forms
a 2-process JAX distributed service over 127.0.0.1 (gloo CPU collectives),
each with ONE local CPU device, so the 2-device data mesh genuinely spans
process boundaries — the same topology as one-chip-per-host TPU pods.  The
process builds its own ``DistributedGroupSampler`` shard (rank auto-derived
from ``jax.process_index()``), assembles the global batch from its local
slice via ``shard_batch`` (``make_array_from_process_local_data``), and runs
one DP train step.  The parent test compares post-step params across the two
processes and against a single-process run on the concatenated batch.

Reference analog being proven end to end: the per-rank loader slice at
/root/reference/datasets/loader/dataset_sampler.py:94-171 feeding
data-parallel training.

Usage: python multiproc_worker.py <process_id> <port> <data_root> <out.npz>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

process_id = int(sys.argv[1])
port = sys.argv[2]
data_root = sys.argv[3]
out_path = sys.argv[4]


def main() -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from torch_detection_tpu.parallel import init_distributed

    info = init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert info["process_count"] == 2, info
    assert len(info["local_devices"]) == 1
    assert len(info["global_devices"]) == 2

    import numpy as np
    import jax.numpy as jnp
    import optax

    from torch_detection_tpu.data import build_dataloader, get_datasets
    from torch_detection_tpu.models.detectors import (
        RetinaNetConfig,
        SingleStageDetector,
        retina_loss,
    )
    from torch_detection_tpu.ops.anchors import AnchorGenerator
    from torch_detection_tpu.parallel import (
        create_train_state,
        make_mesh,
        make_train_step,
        mesh_spans_processes,
        shard_batch,
        shard_params,
    )

    dataset = get_datasets(dict(
        type="CocoDataset",
        ann_file=os.path.join(data_root, "ann.json"),
        img_prefix=os.path.join(data_root, "images"),
        img_means=(0, 0, 0), img_stds=(1, 1, 1), img_expected_sizes=(100, 60),
        size_divisor=32, flip_ratio=0.0,
    ))
    # rank / num_replicas intentionally NOT passed: they must auto-derive
    # from jax.process_index() / process_count() (data/sampler.py)
    loader = build_dataloader(
        dataset, sample_per_replica=2, dist=True, seed=11,
        max_gts=8, canvas=(128, 128), prefetch=0,
    )
    assert loader.sampler.rank == process_id
    assert loader.sampler.num_replicas == 2
    local_batch = next(iter(loader))
    local_batch.pop("img_meta", None)

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

    mesh = make_mesh(data=2, model=1)
    assert mesh_spans_processes(mesh)
    with mesh:
        params = shard_params(mesh, jax.device_get(variables["params"]))
        stats = shard_params(mesh, jax.device_get(variables["batch_stats"]))
        state = create_train_state(params, tx, batch_stats=stats)
        step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)(state)
        state, metrics = step(state, shard_batch(mesh, local_batch))

    # post-step params are replicated (out_shardings) -> fully addressable
    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))[0]
    out = {"/".join(str(k) for k in path): np.asarray(v) for path, v in flat}
    out["__loss__"] = np.float32(metrics["loss"])
    out["__sampler_indices__"] = np.asarray(list(iter(loader.sampler)), np.int64)
    np.savez(out_path, **out)
    jax.distributed.shutdown()
    print(f"worker {process_id}: ok", flush=True)


if __name__ == "__main__":
    main()
