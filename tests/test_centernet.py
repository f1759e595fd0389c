"""CenterNet family: Gaussian targets vs a numpy splat oracle, peak-pick
decode, loss gradients, model assembly, and target->decode round trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_detection_tpu.models.detectors import (
    CenterNetConfig,
    SingleStageDetector,
    centernet_loss,
    centernet_targets,
    decode_centernet,
)
from torch_detection_tpu.models.detectors.centernet import gaussian_radius


def _np_gaussian_radius(h, w, mo):
    a1, b1, c1 = 1.0, h + w, w * h * (1 - mo) / (1 + mo)
    r1 = (b1 - np.sqrt(max(b1 * b1 - 4 * a1 * c1, 0.0))) / (2 * a1)
    a2, b2, c2 = 4.0, 2 * (h + w), (1 - mo) * w * h
    r2 = (b2 - np.sqrt(max(b2 * b2 - 4 * a2 * c2, 0.0))) / (2 * a2)
    a3, b3, c3 = 4.0 * mo, -2 * mo * (h + w), (mo - 1) * w * h
    r3 = (b3 + np.sqrt(max(b3 * b3 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return min(r1, r2, r3)


def _np_targets(cfg, fs, boxes, labels, valid):
    """Classic bounded-window splat oracle."""
    hh, ww = fs
    heat = np.zeros((hh, ww, cfg.num_classes), np.float32)
    dr = float(cfg.down_ratio)
    for (x1, y1, x2, y2), lb, vd in zip(boxes, labels, valid):
        if not vd:
            continue
        w_f, h_f = (x2 - x1 + 1) / dr, (y2 - y1 + 1) / dr
        if w_f <= 0 or h_f <= 0:
            continue
        cx, cy = 0.5 * (x1 + x2) / dr, 0.5 * (y1 + y2) / dr
        ci, cj = int(np.clip(np.floor(cx), 0, ww - 1)), int(np.clip(np.floor(cy), 0, hh - 1))
        r = int(np.floor(max(_np_gaussian_radius(h_f, w_f, cfg.min_overlap), 0.0)))
        sigma = (2 * r + 1) / 6.0
        for yy in range(max(0, cj - r), min(hh, cj + r + 1)):
            for xx in range(max(0, ci - r), min(ww, ci + r + 1)):
                g = np.exp(-((xx - ci) ** 2 + (yy - cj) ** 2) / (2 * sigma ** 2 + 1e-12))
                heat[yy, xx, lb - 1] = max(heat[yy, xx, lb - 1], g)
    return heat


def test_gaussian_radius_matches_numpy():
    for h, w in [(3.0, 5.0), (10.0, 10.0), (2.0, 30.0), (40.0, 7.0)]:
        got = float(gaussian_radius(jnp.asarray(h), jnp.asarray(w), 0.3))
        want = _np_gaussian_radius(h, w, 0.3)
        assert got == pytest.approx(want, rel=1e-5), (h, w)


def test_targets_match_numpy_oracle():
    cfg = CenterNetConfig(num_classes=3, down_ratio=4)
    fs = (24, 32)
    boxes = np.asarray(
        [[8, 8, 47, 39], [60, 20, 119, 79], [100, 60, 115, 75], [0, 0, 0, 0]],
        np.float32,
    )
    labels = np.asarray([1, 2, 1, 3], np.int32)
    valid = np.asarray([True, True, True, False])

    heat, wh_t, off_t, ind, mask = centernet_targets(
        cfg, fs, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)
    )
    want = _np_targets(cfg, fs, boxes, labels, valid)
    np.testing.assert_allclose(np.asarray(heat), want, rtol=1e-5, atol=1e-6)
    # every valid gt stamps an exact 1.0 at its center cell
    assert np.asarray(mask).tolist() == [True, True, True, False]
    hflat = np.asarray(heat).reshape(-1, 3)
    for g in range(3):
        assert hflat[int(ind[g]), labels[g] - 1] == pytest.approx(1.0)
    # wh/offset targets in feature units
    np.testing.assert_allclose(np.asarray(wh_t)[0], [10.0, 8.0], atol=1e-5)
    assert (np.asarray(off_t)[:3] >= 0).all() and (np.asarray(off_t)[:3] < 1).all()


def test_loss_finite_and_grads_flow():
    cfg = CenterNetConfig(num_classes=3)
    rng = np.random.default_rng(0)
    b, hh, ww = 2, 16, 16
    heat = jnp.asarray(rng.normal(size=(b, hh, ww, 3)), jnp.float32)
    wh = jnp.asarray(rng.normal(size=(b, hh, ww, 2)), jnp.float32)
    off = jnp.asarray(rng.normal(size=(b, hh, ww, 2)), jnp.float32)
    gt = jnp.asarray([[[4, 4, 23, 23], [30, 30, 49, 49]]] * b, jnp.float32)
    lbl = jnp.asarray([[1, 2]] * b, jnp.int32)
    vld = jnp.asarray([[True, True]] * b)

    def f(h, w_, o):
        return centernet_loss(cfg, h, w_, o, gt, lbl, vld)["loss"]

    loss, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(heat, wh, off)
    assert np.isfinite(float(loss))
    for g in grads:
        assert float(jnp.sum(jnp.abs(g))) > 0


def test_decode_peak_pick_and_local_max():
    cfg = CenterNetConfig(num_classes=2, max_detections=4, score_thr=0.1)
    hh, ww = 16, 16
    heat = np.full((1, hh, ww, 2), -10.0, np.float32)
    heat[0, 5, 6, 0] = 4.0  # strong peak
    heat[0, 5, 7, 0] = 3.0  # 8-neighbour: must be suppressed by the 3x3 pool
    heat[0, 12, 3, 1] = 2.0  # second class peak
    wh = np.zeros((1, hh, ww, 2), np.float32)
    off = np.zeros((1, hh, ww, 2), np.float32)
    wh[0, 5, 6] = [10.0, 8.0]
    off[0, 5, 6] = [0.5, 0.25]
    wh[0, 12, 3] = [4.0, 4.0]

    res = jax.jit(lambda h, w_, o: decode_centernet(cfg, h, w_, o))(
        jnp.asarray(heat), jnp.asarray(wh), jnp.asarray(off)
    )
    v = np.asarray(res.valid[0])
    assert v.sum() == 2  # the shoulder at (5,7) was suppressed
    labels = np.asarray(res.labels[0])[v]
    assert set(labels.tolist()) == {0, 1}
    # top detection: center (6.5, 5.25)*4, size (40, 32)
    bx = np.asarray(res.boxes[0][0])
    cx, cy = (bx[0] + bx[2]) / 2, (bx[1] + bx[3]) / 2
    assert cx == pytest.approx(6.5 * 4, abs=1e-3)
    assert cy == pytest.approx(5.25 * 4, abs=1e-3)
    assert bx[2] - bx[0] + 1 == pytest.approx(40.0, abs=1e-3)
    assert bx[3] - bx[1] + 1 == pytest.approx(32.0, abs=1e-3)


def test_target_decode_round_trip():
    """Perfect predictions (logit(target) heatmap + exact wh/off at centers)
    must decode back to the gt boxes."""
    cfg = CenterNetConfig(num_classes=2, max_detections=4, score_thr=0.5)
    fs = (32, 32)
    boxes = np.asarray([[8, 12, 47, 43], [72, 80, 103, 119]], np.float32)
    labels = np.asarray([1, 2], np.int32)
    valid = np.asarray([True, True])

    heat, wh_t, off_t, ind, mask = centernet_targets(
        cfg, fs, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)
    )
    p = np.clip(np.asarray(heat), 1e-6, 1 - 1e-6)
    logits = np.log(p / (1 - p))
    wh = np.zeros((*fs, 2), np.float32)
    off = np.zeros((*fs, 2), np.float32)
    for g in range(2):
        cy, cx = divmod(int(ind[g]), fs[1])
        wh[cy, cx] = np.asarray(wh_t)[g]
        off[cy, cx] = np.asarray(off_t)[g]

    res = decode_centernet(
        cfg, jnp.asarray(logits)[None], jnp.asarray(wh)[None], jnp.asarray(off)[None]
    )
    v = np.asarray(res.valid[0])
    assert v.sum() == 2
    got = np.asarray(res.boxes[0])[v]
    lbl = np.asarray(res.labels[0])[v]
    order = np.argsort(got[:, 0])
    np.testing.assert_allclose(got[order], boxes, atol=1e-3)
    assert (lbl[order] + 1 == labels).all()


def test_model_assembly_shapes():
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
        neck=dict(type="CTResNetNeck", in_channels=512,
                  num_deconv_filters=(32, 16, 8)),
        head=dict(type="CenterNetHead", num_classes=3, in_channels=8,
                  feat_channels=8),
    )
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    heat, wh, off = model.apply(variables, x)
    assert heat.shape == (1, 16, 16, 3)
    assert wh.shape == (1, 16, 16, 2)
    assert off.shape == (1, 16, 16, 2)


def test_builder_roundtrip():
    from torch_detection_tpu.builder import build_detection_cfg, build_loss_fn

    cfg = build_detection_cfg(dict(
        style="centernet", num_classes=3, down_ratio=4, score_thr=0.2,
        max_detections=10,
    ))
    assert isinstance(cfg, CenterNetConfig)
    assert cfg.score_thr == 0.2

    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(3,)),
        neck=dict(type="CTResNetNeck", in_channels=512,
                  num_deconv_filters=(32, 16, 8)),
        head=dict(type="CenterNetHead", num_classes=3, in_channels=8,
                  feat_channels=8),
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    loss_fn = build_loss_fn(model, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.asarray([[[4, 4, 33, 23], [20, 30, 49, 59]]] * 2, jnp.float32),
        "gt_labels": jnp.asarray([[1, 3]] * 2, jnp.int32),
        "gt_valid": jnp.asarray([[True, True]] * 2),
    }
    loss, aux = jax.jit(loss_fn)(
        variables["params"], variables.get("batch_stats", {}), batch
    )
    assert np.isfinite(float(loss))
    assert float(aux["num_pos"]) == pytest.approx(2.0)
