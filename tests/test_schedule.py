"""DDPM schedule numerics vs closed forms (SURVEY §4.1; ref sd/ddpm.py)."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.sampling import ddpm


def test_beta_schedule_closed_form():
    s = ddpm.make_schedule()
    betas = np.asarray(s.betas)
    assert betas.shape == (1000,)
    # scaled-linear endpoints (ddpm.py:30,43)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # closed form at an interior point
    i = 500
    expect = (0.00085**0.5 + (0.012**0.5 - 0.00085**0.5) * i / 999) ** 2
    np.testing.assert_allclose(betas[i], expect, rtol=1e-5)
    # alpha-bar is the cumprod (ddpm.py:48)
    np.testing.assert_allclose(
        np.asarray(s.alphas_cumprod), np.cumprod(1 - betas), rtol=1e-5)


def test_reference_beta_start_quirk():
    """The reference's beta_start default is the typo 0.000085 (ref
    ddpm.py:30) — one zero more than the CompVis 0.00085 its comment cites.
    Our default is the correct value; quirk mode reproduces the typo."""
    assert ddpm.BETA_START == 0.00085
    assert ddpm.REFERENCE_BETA_START == 0.000085
    s = ddpm.make_schedule(beta_start=ddpm.REFERENCE_BETA_START)
    betas = np.asarray(s.betas)
    np.testing.assert_allclose(betas[0], 0.000085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    # the two schedules genuinely differ (so quirk-mode tests are meaningful)
    assert not np.allclose(betas, np.asarray(ddpm.make_schedule().betas))


def test_inference_timesteps_spacing():
    ts = ddpm.inference_timesteps(50)
    assert ts.dtype == np.int32 and len(ts) == 50
    assert ts[0] == 980 and ts[-1] == 0            # (arange(50)*20) reversed
    assert np.all(np.diff(ts) == -20)              # ddpm.py:56-63
    ts20 = ddpm.inference_timesteps(20)
    assert ts20[0] == 950 and len(ts20) == 20 and np.all(np.diff(ts20) == -50)


def test_start_step_for_strength():
    # ddpm.py:90-99: skip n*(1-strength) steps
    assert ddpm.start_step_for_strength(50, 1.0) == 0
    assert ddpm.start_step_for_strength(50, 0.8) == 10
    assert ddpm.start_step_for_strength(50, 0.9) == 5
    assert ddpm.start_step_for_strength(50, 0.01) == 50


def test_add_noise_formula():
    s = ddpm.make_schedule()
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 4, 3).astype(np.float32)
    noise = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = 500
    got = np.asarray(ddpm.add_noise(s, x0, t, noise))
    a = np.asarray(s.alphas_cumprod)[t]
    expect = np.sqrt(a) * x0 + np.sqrt(1 - a) * noise
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_step_posterior_formula():
    """One ancestral step vs the DDPM-paper closed form (ddpm.py:102-139)."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 4, 4).astype(np.float32)
    n_steps, t = 50, 980
    got = np.asarray(ddpm.step(s, t, lat, eps, noise, num_inference_steps=n_steps))

    prev_t = t - 1000 // n_steps
    a_t, a_prev = acp[t], acp[prev_t]
    b_t, b_prev = 1 - a_t, 1 - a_prev
    cur_a = a_t / a_prev
    x0 = (lat - np.sqrt(b_t) * eps) / np.sqrt(a_t)
    mean = np.sqrt(a_prev) * (1 - cur_a) / b_t * x0 + np.sqrt(cur_a) * b_prev / b_t * lat
    var = max(b_prev / b_t * (1 - cur_a), 1e-20)
    expect = mean + np.sqrt(var) * noise
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_step_t0_adds_no_noise():
    s = ddpm.make_schedule()
    lat = np.ones((1, 2, 2, 4), np.float32)
    eps = np.zeros_like(lat)
    huge = np.full_like(lat, 1e6)
    got = np.asarray(ddpm.step(s, 0, lat, eps, huge, num_inference_steps=50))
    assert np.isfinite(got).all() and np.abs(got).max() < 10.0


def test_step_prev_t_below_zero_uses_alpha_one():
    """For the final step prev_t<0 -> alpha_bar_prev == 1 (ddpm.py:107-108)."""
    s = ddpm.make_schedule()
    lat = np.ones((1, 1, 1, 1), np.float32)
    eps = np.zeros_like(lat)
    got = np.asarray(ddpm.step(s, 5, lat, eps, np.zeros_like(lat),
                               num_inference_steps=50))
    acp = np.asarray(s.alphas_cumprod, np.float64)
    a_t = acp[5]
    b_t = 1 - a_t
    x0 = lat / np.sqrt(a_t)
    mean = np.sqrt(1.0) * (1 - a_t) / b_t * x0 + np.sqrt(a_t) * 0.0 / b_t * lat
    np.testing.assert_allclose(got, mean, rtol=2e-4)


def test_trailing_timesteps():
    """Trailing grid ends exactly at the terminal timestep (Lin et al.
    2024 §3.2; what SDXL-Turbo-style few-step sampling uses)."""
    np.testing.assert_array_equal(ddpm.trailing_timesteps(4),
                                  [999, 749, 499, 249])
    ts = ddpm.trailing_timesteps(50)
    assert ts[0] == 999 and ts[-1] == 19 and len(ts) == 50
    assert (np.diff(ts) < 0).all()
    # uniform spacing never reaches the terminal step — the flaw trailing
    # fixes
    assert ddpm.inference_timesteps(50)[0] == 980


def test_zero_terminal_snr_rescale():
    s0 = ddpm.make_schedule()
    s = ddpm.make_schedule(zero_terminal_snr=True)
    a0 = np.asarray(s0.alphas_cumprod, np.float64)
    a = np.asarray(s.alphas_cumprod, np.float64)
    # terminal alpha-bar pinned to 2^-24 (SNR(T) ~ 0; exact 0 would break
    # every eps -> x0 division)
    np.testing.assert_allclose(a[-1], 2.0**-24, rtol=1e-6)
    # initial alpha-bar preserved (alg. 1 rescales, does not shift, t=0)
    np.testing.assert_allclose(a[0], a0[0], rtol=1e-5)
    # still a valid monotone schedule; betas in (0, 1] with the terminal
    # beta exactly 1 (alpha_T = 0 is the zero-SNR defining property)
    assert (np.diff(a) < 0).all()
    b = np.asarray(s.betas, np.float64)
    assert (b > 0).all() and (b <= 1).all() and b[-1] == 1.0
    # closed form: sqrt(abar) is the affine rescale of the original
    r0, rT = np.sqrt(a0[0]), np.sqrt(a0[-1])
    expect = ((np.sqrt(a0) - rT) * (r0 / (r0 - rT))) ** 2
    np.testing.assert_allclose(a[:-1], expect[:-1], rtol=1e-4, atol=1e-9)


def test_zero_snr_trailing_pipeline(tiny_models, tiny_tokenizer):
    """The full zero-SNR recipe (v-pred + rescaled betas + trailing grid +
    guidance rescale) compiles and runs; the schedule change alters the
    image."""
    import dataclasses

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg_v = tiny_sd_config(prediction_type="v")
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=3,
              n_inference_steps=2, height=16, width=16,
              timestep_spacing="trailing", guidance_rescale=0.7)
    img_plain = sdt.generate("a cat", config=cfg_v, **kw)
    cfg_z = dataclasses.replace(cfg_v, zero_terminal_snr=True)
    img_z = sdt.generate("a cat", config=cfg_z, **kw)
    assert img_z.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img_z, np.float64)).all()
    assert (img_z != img_plain).any()
