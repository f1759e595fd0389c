"""Mask head tests: shapes, targets via RoIAlign, loss, pasting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.heads import (
    FCNMaskHead,
    mask_loss,
    mask_targets_for_rois,
    paste_masks,
)


class TestFCNMaskHead:
    def test_shapes(self, rng):
        m = FCNMaskHead(num_classes=3, in_channels=8, conv_channels=8, num_convs=2)
        feats = jnp.asarray(rng.normal(size=(2, 4, 7, 7, 8)), jnp.float32)
        vars_ = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        out = m.apply(vars_, feats)
        assert out.shape == (2, 4, 14, 14, 3)


class TestMaskTargets:
    def test_exact_crop(self):
        # gt mask: ones inside [8..23]^2 of a 32x32 image
        mask = np.zeros((1, 32, 32), np.uint8)
        mask[0, 8:24, 8:24] = 1
        rois = jnp.array([[8.0, 8.0, 24.0, 24.0]])
        t = mask_targets_for_rois(jnp.asarray(mask), rois, jnp.array([0]), mask_size=8)
        assert t.shape == (1, 8, 8)
        # roi coincides with the mask -> target nearly all ones
        assert float(t.mean()) > 0.9

    def test_off_mask_roi(self):
        mask = np.zeros((1, 32, 32), np.uint8)
        mask[0, :8, :8] = 1
        rois = jnp.array([[20.0, 20.0, 30.0, 30.0]])
        t = mask_targets_for_rois(jnp.asarray(mask), rois, jnp.array([0]), mask_size=8)
        assert float(t.sum()) == 0.0

    def test_pyramid_matches_fullres_crop(self, rng):
        # the pyramid-routed targets must agree with a direct full-res
        # bilinear crop+threshold except on boundary cells
        from torch_detection_tpu.ops.roi_align import roi_align

        h = w = 128
        masks = np.zeros((2, h, w), np.uint8)
        masks[0, 20:90, 30:110] = 1  # big blob
        masks[1, 40:60, 40:64] = 1  # small blob
        gt = jnp.asarray(masks)
        rois = jnp.array(
            [[25.0, 15.0, 115.0, 95.0], [38.0, 38.0, 66.0, 62.0]]
        )
        matched = jnp.array([0, 1])
        got = mask_targets_for_rois(gt, rois, matched, mask_size=14)

        def direct(roi, m):
            s = roi_align(m[..., None].astype(jnp.float32), roi[None], 1.0,
                          out_size=14, sampling_ratio=2)[0, ..., 0]
            return (s >= 0.5).astype(jnp.float32)

        want = jax.vmap(direct)(rois, gt[matched])
        agree = float((got == want).mean())
        assert agree > 0.93, f"pyramid/full-res agreement {agree}"


class TestMaskLoss:
    def test_perfect_prediction_low_loss(self):
        targets = jnp.ones((1, 2, 4, 4))
        logits = jnp.full((1, 2, 4, 4, 3), -10.0)
        logits = logits.at[..., 0].set(10.0)  # class 1 channel predicts 1
        labels = jnp.array([[1, 1]], jnp.int32)
        pos = jnp.array([[True, True]])
        loss = mask_loss(logits, targets, labels, pos)
        assert float(loss) < 1e-3
        bad = mask_loss(-logits, targets, labels, pos)
        assert float(bad) > 1.0

    def test_only_positive_rois_counted(self):
        targets = jnp.zeros((1, 2, 4, 4))
        logits = jnp.full((1, 2, 4, 4, 2), 10.0)  # wrong everywhere
        labels = jnp.array([[1, 1]], jnp.int32)
        pos = jnp.array([[False, False]])
        assert float(mask_loss(logits, targets, labels, pos)) == 0.0


class TestPaste:
    def test_paste_fills_box(self):
        probs = jnp.ones((1, 8, 8))
        boxes = jnp.array([[4.0, 4.0, 12.0, 12.0]])
        out = paste_masks(probs, boxes, (20, 20))
        arr = np.asarray(out[0])
        assert arr[8, 8] and not arr[0, 0] and not arr[15, 15]
        # roughly the box area
        assert 60 <= arr.sum() <= 90
