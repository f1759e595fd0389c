import numpy as np
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu.data.ops import (
    img_aspect_ratio_flag,
    img_crop,
    img_denormalize,
    img_flip,
    img_normalize,
    img_pad,
    img_pad_size_divisor,
    img_read,
    img_resize,
    img_rotate,
    img_write,
    pad_shape_divisor,
    rescale_size,
)


def _img(h=20, w=30, c=3):
    return np.arange(h * w * c, dtype=np.uint8).reshape(h, w, c)


class TestIO:
    def test_roundtrip(self, tmp_path):
        img = _img()
        p = str(tmp_path / "sub" / "img.png")
        img_write(img, p, img_mode="bgr")
        back = img_read(p, img_mode="bgr")
        # png is lossless but cv2 writes BGR; we asked both sides for bgr-native
        np.testing.assert_array_equal(back, img)

    def test_rgb_mode_swaps_channels(self, tmp_path):
        img = np.zeros((4, 4, 3), np.uint8)
        img[..., 0] = 255  # red in rgb
        p = str(tmp_path / "img.png")
        img_write(img, p, img_mode="rgb")
        back = img_read(p, img_mode="rgb")
        np.testing.assert_array_equal(back, img)

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            img_read("/nonexistent/file.png")


class TestNormalize:
    def test_normalize_denormalize(self):
        img = _img().astype(np.float32)
        mean = [1.0, 2.0, 3.0]
        std = [2.0, 4.0, 8.0]
        normed = img_normalize(img, mean, std)
        assert normed.dtype == np.float32
        np.testing.assert_allclose(normed[..., 1], (img[..., 1] - 2.0) / 4.0, rtol=1e-5)
        back = img_denormalize(normed, mean, std)
        np.testing.assert_allclose(back, img, atol=1e-3)


class TestResize:
    def test_rescale_size_tuple_rule(self):
        # scale = min(short_cap/short, long_cap/long): reference image.py:185
        (nh, nw), sf = rescale_size((400, 600), (1333, 800))
        assert sf == min(800 / 400, 1333 / 600)
        assert (nh, nw) == (int(np.round(400 * sf)), int(np.round(600 * sf)))

    def test_short_edge_int(self):
        img = _img(100, 200)
        out, sf = img_resize(img, size=300, return_scale=True)
        assert sf == 3.0 and out.shape[:2] == (300, 600)

    def test_scale_factor(self):
        img = _img(10, 20)
        out = img_resize(img, scale_factor=2.0)
        assert out.shape[:2] == (20, 40)
        out, sf = img_resize(img, scale_factor=0.5, return_scale=True)
        assert sf == 0.5 and out.shape[:2] == (5, 10)

    def test_scale_factor_choice(self, rng):
        img = _img(10, 10)
        out, sf = img_resize(img, scale_factor=(1.0, 2.0), return_scale=True, rng=rng)
        assert sf in (1.0, 2.0)

    def test_errors(self):
        img = _img()
        with pytest.raises(ValueError):
            img_resize(img)
        with pytest.raises(ValueError):
            img_resize(img, size=100, scale_factor=1.0)
        with pytest.raises(ValueError):
            img_resize(img, size=100, return_scale=False)


class TestFlip:
    def test_no_flip(self, rng):
        img = _img()
        out, flag, d = img_flip(img, flip_prob=0.0, rng=rng)
        assert not flag and out is img

    def test_always_flip_h(self, rng):
        img = _img()
        out, flag, d = img_flip(img, flip_prob=1.0, rng=rng)
        assert flag and d == "horizontal"
        np.testing.assert_array_equal(out, img[:, ::-1])

    def test_always_flip_v(self, rng):
        img = _img()
        out, flag, _ = img_flip(img, flip_prob=1.0, direction="vertical", rng=rng)
        assert flag
        np.testing.assert_array_equal(out, img[::-1])

    def test_deterministic_with_seed(self):
        img = _img()
        flags = [img_flip(img, 0.5, rng=np.random.default_rng(7))[1] for _ in range(3)]
        assert len(set(flags)) == 1


class TestPad:
    def test_pad_basic(self):
        img = _img(5, 7)
        out = img_pad(img, (8, 10), pad_val=3)
        assert out.shape == (8, 10, 3)
        np.testing.assert_array_equal(out[:5, :7], img)
        assert (out[5:, :, :] == 3).all() and (out[:, 7:, :] == 3).all()

    def test_pad_divisor(self):
        img = _img(30, 33)
        out = img_pad_size_divisor(img, 32)
        assert out.shape[:2] == (32, 64)
        assert pad_shape_divisor((30, 33), 32) == (32, 64)

    def test_per_channel_pad_val(self):
        img = _img(2, 2)
        out = img_pad(img, (4, 4), pad_val=(1, 2, 3))
        assert tuple(out[3, 3]) == (1, 2, 3)


class TestCropRotateRatio:
    def test_crop(self):
        img = _img(10, 12)
        out = img_crop(img, (5, 4), min_w=2, min_h=1)  # size_crop is (w, h)
        assert out.shape[:2] == (4, 5)
        np.testing.assert_array_equal(out, img[1:5, 2:7])

    def test_crop_out_of_bounds(self):
        with pytest.raises(AssertionError):
            img_crop(_img(4, 4), (10, 10))

    def test_rotate_180(self):
        img = np.zeros((5, 5, 3), np.uint8)
        img[0, 0] = 255
        out = img_rotate(img, 180)
        assert out[4, 4, 0] == 255

    def test_rotate_auto_bound(self):
        out = img_rotate(_img(10, 20), 90, auto_bound=True)
        assert out.shape[:2] == (20, 10)

    def test_aspect_flag(self):
        assert img_aspect_ratio_flag(20, 10) == 1
        assert img_aspect_ratio_flag(10, 20) == 0
