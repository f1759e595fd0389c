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


class TestS2DWire:
    """Space-to-depth wire (stem_s2d backbones): kernel + host transform."""

    def test_s2d_normalize_matches_oracle(self, rng):
        from torch_detection_tpu.ops.preprocess import (
            fused_normalize_pad_s2d,
            space_to_depth_2x2_np,
        )

        imgs = rng.integers(0, 255, (3, 32, 48, 3), np.uint8)
        shapes = np.array([[32, 48], [25, 37], [18, 48]], np.int32)
        for i, (h, w) in enumerate(shapes):
            imgs[i, h:, :, :] = 0
            imgs[i, :, w:, :] = 0
        want = space_to_depth_2x2_np(normalize_pad_reference(imgs, shapes))
        got = np.asarray(
            fused_normalize_pad_s2d(
                jnp.asarray(space_to_depth_2x2_np(imgs)), jnp.asarray(shapes),
                out_dtype=jnp.float32, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_np_jnp_s2d_agree(self, rng):
        from torch_detection_tpu.models.backbones.resnet import space_to_depth_2x2
        from torch_detection_tpu.ops.preprocess import space_to_depth_2x2_np

        x = rng.normal(size=(2, 8, 10, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            space_to_depth_2x2_np(x), np.asarray(space_to_depth_2x2(jnp.asarray(x)))
        )
        # invertible: every input pixel appears exactly once
        s = space_to_depth_2x2_np(x)
        back = (
            s.reshape(2, 4, 5, 2, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(2, 8, 10, 3)
        )
        np.testing.assert_array_equal(back, x)


def test_maxpool_two_pass_exact(rng):
    """Separable decomposition in max_pool_same_torch == joint 2-D window."""
    import jax

    from torch_detection_tpu.models.layers import max_pool_same_torch

    x = jnp.asarray(rng.normal(size=(2, 15, 21, 8)).astype(np.float32))
    for window, stride, pad in ((3, 2, 1), (2, 2, 0), (3, 1, 1)):
        got = max_pool_same_torch(x, window, stride, pad)
        want = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, window, window, 1), (1, stride, stride, 1),
            ((0, 0), (pad, pad), (pad, pad), (0, 0)),
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
