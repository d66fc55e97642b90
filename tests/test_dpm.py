"""DPM-Solver++(2M): exactness invariants + pipeline integration."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddim, ddpm, dpm

N_STEPS = 2
H = W = 16


def _run_sampler(x0_fn, n_steps, x_init, use_dpm=True):
    """Run a full sampling trajectory with a synthetic model whose
    x0-prediction is given by x0_fn(x, t)."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    ts = ddpm.inference_timesteps(n_steps)
    x = x_init.astype(np.float32)
    state = dpm.init_state(x.shape)
    for t in ts:
        a = acp[int(t)]
        alpha, sigma = np.sqrt(a), np.sqrt(1 - a)
        x0 = x0_fn(x, int(t))
        eps = ((x - alpha * x0) / sigma).astype(np.float32)
        if use_dpm:
            x, state = dpm.step(s, int(t), x, eps, state,
                                num_inference_steps=n_steps)
        else:
            x = ddim.step(s, int(t), x, eps, np.zeros_like(x),
                          num_inference_steps=n_steps)
        x = np.asarray(x)
    return x


def test_constant_x0_is_solved_exactly():
    """A model with constant x0-prediction must land on it exactly, at any
    step count (see sampling/dpm.py exactness invariant)."""
    C = np.full((1, 2, 2, 4), 0.37, np.float32)
    rng = np.random.RandomState(0)
    x_init = rng.randn(1, 2, 2, 4).astype(np.float32)
    for n in (2, 5, 10):
        out = _run_sampler(lambda x, t: C, n, x_init)
        np.testing.assert_allclose(out, C, rtol=1e-4, atol=1e-4)


def test_first_step_equals_ddim():
    """Order-1 DPM-Solver++ is algebraically a DDIM eta=0 step."""
    s = ddpm.make_schedule()
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, n = 980, 50
    got, _ = dpm.step(s, t, x, eps, dpm.init_state(x.shape),
                      num_inference_steps=n)
    expect = ddim.step(s, t, x, eps, np.zeros_like(x), num_inference_steps=n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-5)


def test_second_order_beats_first_order():
    """For a smooth x-dependent model, few-step dpm++ lands closer to the
    many-step reference solution than few-step ddim does."""
    def x0_fn(x, t):  # smooth state-dependent data prediction
        return np.tanh(x) * 0.8

    rng = np.random.RandomState(2)
    x_init = rng.randn(1, 2, 2, 4).astype(np.float32)
    ref = _run_sampler(x0_fn, 500, x_init, use_dpm=False)  # fine-step DDIM = ODE ref
    few_dpm = _run_sampler(x0_fn, 8, x_init, use_dpm=True)
    few_ddim = _run_sampler(x0_fn, 8, x_init, use_dpm=False)
    err_dpm = np.abs(few_dpm - ref).mean()
    err_ddim = np.abs(few_ddim - ref).mean()
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_final_step_returns_x0():
    s = ddpm.make_schedule()
    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    acp = np.asarray(s.alphas_cumprod, np.float64)
    got, _ = dpm.step(s, 0, x, eps, dpm.init_state(x.shape),
                      num_inference_steps=50)
    x0 = (x - np.sqrt(1 - acp[0]) * eps) / np.sqrt(acp[0])
    np.testing.assert_allclose(np.asarray(got), x0, rtol=2e-4, atol=2e-5)


def test_pipeline_dpm(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    img = sdt.generate("a cat", sampler_name="dpm++", **kw)
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    img2 = sdt.generate("a cat", sampler_name="dpm++", **kw)
    assert (img == img2).all()  # deterministic
    img_ddpm = sdt.generate("a cat", sampler_name="ddpm", **kw)
    assert (img != img_ddpm).any()


# ------------------------------------------------------------ DPM++ 2M SDE
def _lam_sig(acp, t):
    a = acp[t]
    return np.sqrt(a), np.sqrt(1 - a)


def test_sde_first_order_closed_form():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    z = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, n = 980, 50
    prev = t - 1000 // n
    got, _ = dpm.step_sde(s, t, x, eps, z, dpm.init_state(x.shape),
                          num_inference_steps=n)
    a_t, s_t = _lam_sig(acp, t)
    a_n, s_n = _lam_sig(acp, prev)
    x0 = (x - s_t * eps) / a_t
    e_h = (a_t * s_n) / (s_t * a_n)
    expect = (s_n / s_t) * e_h * x + a_n * (1 - e_h**2) * x0 \
        + s_n * np.sqrt(1 - e_h**2) * z
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-4, atol=2e-5)


def test_sde_second_order_midpoint_form():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    z = np.zeros_like(x)
    n = 50
    t1, t0 = 980, 960  # two consecutive grid points
    prev = 940
    state = dpm.init_state(x.shape)
    x1, state = dpm.step_sde(s, t1, x, eps, z, state, num_inference_steps=n)
    eps2 = rng.randn(1, 4, 4, 4).astype(np.float32)
    got, _ = dpm.step_sde(s, t0, x1, eps2, z, state, num_inference_steps=n)
    # oracle with the recorded first x0 and equal log-snr gaps (r = h'/h)
    a_t1, s_t1 = _lam_sig(acp, t1)
    x0_prev = (x - s_t1 * eps) / a_t1
    a_t, s_t = _lam_sig(acp, t0)
    a_n, s_n = _lam_sig(acp, prev)
    x0 = (np.asarray(x1) - s_t * eps2) / a_t
    lam = lambda a, sg: np.log(a / sg)
    h_prev = lam(a_t, s_t) - lam(a_t1, s_t1)
    h = lam(a_n, s_n) - lam(a_t, s_t)
    r = h_prev / h
    d = x0 + (1.0 / (2 * r)) * (x0 - x0_prev)
    e_h = (a_t * s_n) / (s_t * a_n)
    expect = (s_n / s_t) * e_h * np.asarray(x1) + a_n * (1 - e_h**2) * d
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-3, atol=2e-4)


def test_sde_variance_preserving_coefficients():
    """x-coefficient^2 (per unit sigma_t) + noise-coefficient^2 = sigma_n^2:
    a correctly-noised marginal stays correctly noised."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    for t, prev in [(980, 960), (500, 480), (100, 80)]:
        a_t, s_t = _lam_sig(acp, t)
        a_n, s_n = _lam_sig(acp, prev)
        e_h = (a_t * s_n) / (s_t * a_n)
        c_x_noise = (s_n / s_t) * e_h * s_t       # multiplies the d in x
        c_z = s_n * np.sqrt(1 - e_h**2)
        np.testing.assert_allclose(c_x_noise**2 + c_z**2, s_n**2, rtol=1e-12)


def test_sde_final_step_returns_x0():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(2)
    x = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    big = np.full_like(x, 1e6)
    st = dpm.init_state(x.shape)
    st = {**st, "count": np.int32(3), "prev_h": np.float32(0.5),
          "prev_x0": rng.randn(1, 2, 2, 4).astype(np.float32)}
    got, _ = dpm.step_sde(s, 0, x, eps, big, st, num_inference_steps=50)
    a, sg = _lam_sig(acp, 0)
    x0 = (x - sg * eps) / a
    np.testing.assert_allclose(np.asarray(got), x0, rtol=2e-4, atol=2e-5)


def test_pipeline_dpm_sde(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    a = sdt.generate("a cat", sampler_name="dpm++_sde", **kw)
    assert a.shape == (H, W, 3)
    a2 = sdt.generate("a cat", sampler_name="dpm++_sde", **kw)
    assert (a == a2).all()
    b = sdt.generate("a cat", sampler_name="dpm++_sde", **{**kw, "seed": 9})
    assert (a != b).any()  # the injected noise is seed-dependent
    det = sdt.generate("a cat", sampler_name="dpm++", **kw)
    assert (a != det).any()
