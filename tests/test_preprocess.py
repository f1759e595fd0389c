"""Pallas preprocessing kernel vs numpy oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.ops.preprocess import (
    fused_normalize_pad,
    normalize_pad_reference,
)


class TestFusedNormalizePad:
    def _run(self, rng, b=2, h=16, w=24, shapes=None):
        imgs = rng.integers(0, 255, (b, h, w, 3), np.uint8)
        shapes = np.asarray(shapes if shapes is not None else [[h, w]] * b, np.int32)
        # zero the canvas pad region like the host loader does
        for i, (ih, iw) in enumerate(shapes):
            imgs[i, ih:, :, :] = 0
            imgs[i, :, iw:, :] = 0
        got = fused_normalize_pad(
            jnp.asarray(imgs), jnp.asarray(shapes), out_dtype=jnp.float32, interpret=True
        )
        want = normalize_pad_reference(imgs, shapes)
        return np.asarray(got), want

    def test_full_images(self, rng):
        got, want = self._run(rng)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_padded_region_zeroed(self, rng):
        got, want = self._run(rng, shapes=[[10, 20], [16, 24]])
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert (got[0, 10:, :, :] == 0).all()
        assert (got[0, :, 20:, :] == 0).all()
        assert np.abs(got[0, :10, :20]).max() > 0

    def test_bf16_output(self, rng):
        imgs = rng.integers(0, 255, (1, 8, 16, 3), np.uint8)
        shapes = np.asarray([[8, 16]], np.int32)
        got = fused_normalize_pad(
            jnp.asarray(imgs), jnp.asarray(shapes), out_dtype=jnp.bfloat16, interpret=True
        )
        assert got.dtype == jnp.bfloat16
        want = normalize_pad_reference(imgs, shapes)
        np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=0.02, rtol=0.01)

    def test_custom_mean_std(self, rng):
        imgs = rng.integers(0, 255, (1, 8, 16, 3), np.uint8)
        shapes = np.asarray([[8, 16]], np.int32)
        mean, std = (10.0, 20.0, 30.0), (2.0, 4.0, 8.0)
        got = fused_normalize_pad(
            jnp.asarray(imgs), jnp.asarray(shapes), mean=mean, std=std,
            out_dtype=jnp.float32, interpret=True,
        )
        want = normalize_pad_reference(imgs, shapes, mean, std)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
