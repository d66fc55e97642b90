"""Metric helpers (the BASELINE correctness contract)."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.utils.metrics import image_psnr, latent_mae, psnr


def test_psnr_identical_is_huge():
    x = np.random.RandomState(0).randn(64)
    assert psnr(x, x) > 100


def test_psnr_known_value():
    a = np.ones(1000)
    b = a + 0.01  # mse 1e-4, peak 1 -> 40 dB
    np.testing.assert_allclose(psnr(a, b), 40.0, atol=1e-6)


def test_image_psnr_uint8():
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy(); b[0, 0, 0] = 255
    expect = 10 * np.log10(255**2 / (255**2 / 192))
    np.testing.assert_allclose(image_psnr(a, b), expect, atol=1e-6)


def test_shape_mismatch_raises():
    with pytest.raises(ValueError):
        psnr(np.zeros(3), np.zeros(4))


def test_latent_mae():
    assert latent_mae(np.zeros(4), np.ones(4)) == 1.0
