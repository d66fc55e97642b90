"""DDIM sampler — formula goldens + pipeline integration."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddim, ddpm

N_STEPS = 2
H = W = 16


def test_step_closed_form():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, n = 980, 50
    got = np.asarray(ddim.step(s, t, lat, eps, np.zeros_like(lat),
                               num_inference_steps=n))
    a_t, a_prev = acp[t], acp[t - 1000 // n]
    x0 = (lat - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expect = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps  # eta=0
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_eta_zero_ignores_noise():
    s = ddpm.make_schedule()
    lat = np.ones((1, 2, 2, 4), np.float32)
    eps = np.zeros_like(lat)
    a = np.asarray(ddim.step(s, 500, lat, eps, np.zeros_like(lat),
                             num_inference_steps=50))
    b = np.asarray(ddim.step(s, 500, lat, eps, np.full_like(lat, 1e6),
                             num_inference_steps=50))
    np.testing.assert_array_equal(a, b)


def test_eta_one_matches_ddpm_variance():
    """eta=1 sigma^2 equals the DDPM posterior variance."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    t, n = 980, 50
    a_t, a_prev = acp[t], acp[t - 20]
    sigma2 = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    ddpm_var = (1 - a_prev) / (1 - a_t) * (1 - (a_t / a_prev))
    np.testing.assert_allclose(sigma2, ddpm_var, rtol=1e-12)


def test_final_step_returns_x0():
    """prev_t < 0 -> a_prev = 1 -> output is exactly the x0 prediction."""
    s = ddpm.make_schedule()
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    got = np.asarray(ddim.step(s, 0, lat, eps, np.zeros_like(lat),
                               num_inference_steps=50))
    acp = np.asarray(s.alphas_cumprod, np.float64)
    x0 = (lat - np.sqrt(1 - acp[0]) * eps) / np.sqrt(acp[0])
    np.testing.assert_allclose(got, x0, rtol=2e-4, atol=2e-5)


def test_pipeline_ddim(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    img_ddim = sdt.generate("a cat", sampler_name="ddim", **kw)
    assert img_ddim.shape == (H, W, 3)
    # deterministic regardless of seed noise streams (eta=0)
    img_ddim2 = sdt.generate("a cat", sampler_name="ddim", seed=4,
                             **{k: v for k, v in kw.items() if k != "seed"})
    assert (img_ddim == img_ddim2).all()
    # differs from ddpm (ancestral noise)
    img_ddpm = sdt.generate("a cat", sampler_name="ddpm", **kw)
    assert (img_ddim != img_ddpm).any()


def test_unknown_sampler_still_rejected(tiny_cfg, tiny_models, tiny_tokenizer):
    # NOTE: the probe name must never be able to become a real sampler
    # (the "plms" trap: round 3 implemented it and this kind of
    # expected-raise silently became a full default-size CPU run).
    with pytest.raises(ValueError, match="Unknown sampler"):
        sdt.generate("x", sampler_name="not_a_sampler", models=tiny_models,
                     tokenizer=tiny_tokenizer, config=tiny_cfg)
