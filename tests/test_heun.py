"""Heun (improved Euler) sampler — formula goldens, order-2 exactness, and
pipeline integration (style of tests/test_euler.py)."""

import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, euler

N_STEPS = 2
H = W = 16


def _sigma(acp, t):
    return np.sqrt((1 - acp[t]) / acp[t])


def test_heun_correct_closed_form():
    """x_next = sqrt(a_next) * (x/sqrt(a_t) + (sig_n - sig) * (d1 + d2)/2)."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    e1 = rng.randn(1, 4, 4, 4).astype(np.float32)
    e2 = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, n = 980, 50
    got = np.asarray(euler.step_heun_correct(s, t, lat, e1, e2,
                                             num_inference_steps=n))
    prev = t - 1000 // n
    sig, sig_n = _sigma(acp, t), _sigma(acp, prev)
    x = lat / np.sqrt(acp[t])
    expect = np.sqrt(acp[prev]) * (x + (sig_n - sig) * 0.5 * (e1 + e2))
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_heun_equals_euler_when_derivative_constant():
    s = ddpm.make_schedule()
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    h = np.asarray(euler.step_heun_correct(s, 500, lat, eps, eps,
                                           num_inference_steps=50))
    e = np.asarray(euler.step(s, 500, lat, eps, None,
                              num_inference_steps=50))
    np.testing.assert_allclose(h, e, rtol=1e-6, atol=1e-6)


def test_heun_final_step_keeps_euler_x0():
    """prev_t < 0: the correction is skipped; result is the Euler x0-hat even
    with a garbage second derivative."""
    s = ddpm.make_schedule()
    rng = np.random.RandomState(2)
    lat = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    garbage = np.full_like(eps, 1e6)
    got = np.asarray(euler.step_heun_correct(s, 0, lat, eps, garbage,
                                             num_inference_steps=50))
    expect = np.asarray(euler.step(s, 0, lat, eps, None,
                                   num_inference_steps=50))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_heun_is_second_order():
    """For eps_hat(X, sigma) = c * sigma the exact Karras-space solution is
    X(sigma) = X0 + c sigma^2 / 2; Heun's trapezoid integrates a linear-in-
    sigma derivative exactly while Euler leaves an O(h^2)-per-step error.
    Integrate the full 10-step schedule with both and compare to analytic."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    n = 10
    ts = np.asarray(ddpm.inference_timesteps(n))
    c = 0.7
    x = np.full((1, 2, 2, 4), 3.0, np.float32)  # Karras-space start
    sig0 = _sigma(acp, ts[0])

    def lat_of(x_karras, t):  # map to latent space for the step functions
        return (np.sqrt(acp[t]) * x_karras).astype(np.float32)

    xe = x.copy()
    xh = x.copy()
    for i, t in enumerate(ts):
        prev = t - 1000 // n
        sig = _sigma(acp, t)
        sig_n = _sigma(acp, prev) if prev >= 0 else 0.0
        e1 = np.full_like(xe, c * sig, np.float32)
        xe = np.asarray(euler.step(s, int(t), lat_of(xe, t), e1, None,
                                   num_inference_steps=n))
        xe = xe / np.sqrt(acp[prev] if prev >= 0 else 1.0)

        e1h = np.full_like(xh, c * sig, np.float32)
        e2h = np.full_like(xh, c * sig_n, np.float32)
        xh_lat = euler.step_heun_correct(s, int(t), lat_of(xh, t), e1h, e2h,
                                         num_inference_steps=n)
        xh = np.asarray(xh_lat) / np.sqrt(acp[prev] if prev >= 0 else 1.0)

    sig_last = _sigma(acp, ts[-1])
    analytic = 3.0 + c * (0.0 - sig0**2) / 2.0
    err_e = abs(float(xe.ravel()[0]) - analytic)
    # Heun's residual error comes only from the final (Euler-rule) step:
    # c * sig_last^2 / 2 at sigma ~ 0.01 — orders of magnitude below Euler's.
    err_h = abs(float(xh.ravel()[0]) - analytic)
    assert err_h < 0.05 * err_e, (err_h, err_e)
    assert err_h < c * sig_last**2  # only the tiny final-step term remains


def test_pipeline_heun(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    img = sdt.generate("a cat", sampler_name="heun", **kw)
    assert img.shape == (H, W, 3)
    img2 = sdt.generate("a cat", sampler_name="heun", **kw)
    assert (img == img2).all()  # deterministic sampler
    img3 = sdt.generate("a cat", sampler_name="heun", **{**kw, "seed": 99})
    assert (img != img3).any()
    img_e = sdt.generate("a cat", sampler_name="euler", **kw)
    assert (img != img_e).any()  # the correction actually changes the output
