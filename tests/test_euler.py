"""Euler / Euler-ancestral samplers — formula goldens + pipeline integration
(style of tests/test_ddim.py)."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, euler

N_STEPS = 2
H = W = 16


def _sigma(acp, t):
    return np.sqrt((1 - acp[t]) / acp[t])


def test_euler_step_closed_form():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, n = 980, 50
    got = np.asarray(euler.step(s, t, lat, eps, np.zeros_like(lat),
                                num_inference_steps=n))
    prev = t - 1000 // n
    sig, sig_n = _sigma(acp, t), _sigma(acp, prev)
    x = lat / np.sqrt(acp[t])
    expect = np.sqrt(acp[prev]) * (x + (sig_n - sig) * eps)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_euler_ignores_noise():
    s = ddpm.make_schedule()
    lat = np.ones((1, 2, 2, 4), np.float32)
    eps = np.zeros_like(lat)
    a = np.asarray(euler.step(s, 500, lat, eps, np.zeros_like(lat),
                              num_inference_steps=50))
    b = np.asarray(euler.step(s, 500, lat, eps, np.full_like(lat, 1e6),
                              num_inference_steps=50))
    np.testing.assert_array_equal(a, b)


def test_final_step_returns_x0():
    """prev_t < 0 -> abar_next = 1 -> sigma_next = 0 -> exactly x0-hat,
    for both variants."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    x0 = (lat - np.sqrt(1 - acp[0]) * eps) / np.sqrt(acp[0])
    for fn in (euler.step, euler.step_ancestral):
        got = np.asarray(fn(s, 0, lat, eps, np.full_like(lat, 1e6),
                            num_inference_steps=50))
        np.testing.assert_allclose(got, x0, rtol=2e-4, atol=2e-5,
                                   err_msg=fn.__name__)


def test_ancestral_split_formula():
    """k-diffusion get_ancestral_step: sigma_down^2 + sigma_up^2 = sigma_next^2
    and sigma_up^2 = sigma_next^2 (sigma^2 - sigma_next^2) / sigma^2."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    t, n = 980, 50
    prev = t - 1000 // n
    sig, sig_n = _sigma(acp, t), _sigma(acp, prev)
    var_up = sig_n**2 * (sig**2 - sig_n**2) / sig**2
    sig_down = np.sqrt(sig_n**2 - var_up)

    rng = np.random.RandomState(2)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 4, 4).astype(np.float32)
    got = np.asarray(euler.step_ancestral(s, t, lat, eps, noise,
                                          num_inference_steps=n))
    x = lat / np.sqrt(acp[t])
    expect = np.sqrt(acp[prev]) * (x + (sig_down - sig) * eps
                                   + np.sqrt(var_up) * noise)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_euler_matches_ddim_eta0_direction():
    """Euler and DDIM(eta=0) integrate the same ODE; a single step from the
    same point must agree to first order (they are not identical — DDIM is
    exact under the linear-x0 assumption — but must be close for one step)."""
    from pytorch_stable_diffusion_tpu.sampling import ddim

    s = ddpm.make_schedule()
    rng = np.random.RandomState(3)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = 0.1 * rng.randn(1, 4, 4, 4).astype(np.float32)
    z = np.zeros_like(lat)
    e = np.asarray(euler.step(s, 500, lat, eps, z, num_inference_steps=50))
    d = np.asarray(ddim.step(s, 500, lat, eps, z, num_inference_steps=50))
    # same direction, small curvature difference
    assert np.abs(e - d).max() < 0.05 * np.abs(d).max()


def test_pipeline_euler(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    img_e = sdt.generate("a cat", sampler_name="euler", **kw)
    assert img_e.shape == (H, W, 3)
    # deterministic: same seed reproduces exactly
    img_e2 = sdt.generate("a cat", sampler_name="euler", **kw)
    assert (img_e == img_e2).all()
    # different seed -> different initial latent -> different image
    img_e3 = sdt.generate("a cat", sampler_name="euler", **{**kw, "seed": 99})
    assert (img_e != img_e3).any()
    img_ea = sdt.generate("a cat", sampler_name="euler_a", **kw)
    assert (img_e != img_ea).any()
    # ancestral injects per-step noise too
    img_ea2 = sdt.generate("a cat", sampler_name="euler_a", **{**kw, "seed": 99})
    assert (img_ea != img_ea2).any()
