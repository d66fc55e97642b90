"""UniPC sampler — exactness invariants + pipeline integration.

The predictor/corrector formulas are validated against the *exact*
exponential-integrator transition
    x_next = (sigma_next/sigma_t) x + alpha_next \\int_{lam_t}^{lam_next}
             e^{lam - lam_next} m(lam) dlam
computed by high-resolution numerical quadrature for polynomial m(lam) —
an oracle independent of the implementation's algebra.
"""

import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddim, ddpm, unipc

N_STEPS = 3
H = W = 16


def _simpson(f, a, b, n=20000):
    xs = np.linspace(a, b, 2 * n + 1)
    ys = f(xs)
    h = (b - a) / (2 * n)
    return h / 3 * (ys[0] + ys[-1] + 4 * ys[1:-1:2].sum() + 2 * ys[2:-1:2].sum())


def _exact_transition(x, lam_from, lam_to, m_of_lam):
    """Exact x0-space exponential integrator between two lambda points."""
    sig_from = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_from))
    sig_to = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_to))
    alpha_to = np.exp(lam_to) * sig_to
    integral = _simpson(lambda lam: np.exp(lam - lam_to) * m_of_lam(lam),
                        lam_from, lam_to)
    return (sig_to / sig_from) * x + alpha_to * integral


def test_predictor_exact_for_linear_x0():
    """Order-2 uni_p (bh2) integrates m(lam) = a + b*lam exactly."""
    a, b = 0.7, -0.35
    m = lambda lam: a + b * lam
    lam_t, h, h_prev = -1.2, 0.8, 0.6
    lam_next = lam_t + h
    sigma_t = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_t))
    sigma_n = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_next))
    alpha_n = np.exp(lam_next) * sigma_n

    x = 1.9
    rk = -h_prev / h
    d1 = (m(lam_t - h_prev) - m(lam_t)) / rk
    u = np.expm1(-h)
    got = float(unipc._predict(
        np.float32(x), np.float32(m(lam_t)), np.float32(d1),
        np.float32(sigma_t), np.float32(alpha_n), np.float32(sigma_n),
        np.float32(h), np.float32(u), second=True))
    expect = _exact_transition(x, lam_t, lam_next, m)
    np.testing.assert_allclose(got, expect, rtol=3e-6, atol=3e-6)


def test_corrector_exact_for_quadratic_x0():
    """Order-2 uni_c (bh2) collocates at three points (t-1, t0, t) — exact
    for quadratic m(lam); the order-1 corrector (fixed rho = 1/2) is not."""
    qa, qb, qc = 0.4, -0.6, 0.25
    m = lambda lam: qa + qb * lam + qc * lam * lam
    lam_t0, h_c, h_prev = -0.9, 0.7, 0.5
    lam_t = lam_t0 + h_c

    sigma_t0 = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_t0))
    sigma_t = 1.0 / np.sqrt(1.0 + np.exp(2.0 * lam_t))
    alpha_t = np.exp(lam_t) * sigma_t

    last = 2.3
    u_c = np.expm1(-h_c)
    rk_prev = -h_prev / h_c
    args = (np.float32(last), np.float32(m(lam_t0)),
            np.float32(m(lam_t0 - h_prev)), np.float32(m(lam_t)),
            np.float32(sigma_t0), np.float32(alpha_t), np.float32(sigma_t),
            np.float32(h_c), np.float32(u_c), np.float32(rk_prev))
    got2 = float(unipc._correct(*args, use_order2=True))
    got1 = float(unipc._correct(*args, use_order2=False))
    expect = _exact_transition(last, lam_t0, lam_t, m)
    np.testing.assert_allclose(got2, expect, rtol=3e-6, atol=3e-6)
    assert abs(got1 - expect) > 50 * abs(got2 - expect)  # order-1 is not exact


def test_constant_x0_lands_exactly():
    """Model predicting constant x0 = C: alpha_t C + sigma_t d ->
    alpha_next C + sigma_next d at every step, landing on C at t = 0 —
    for ANY step count (the dpm.py invariant; corrector terms vanish)."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    C, d = 1.25, -0.5
    for n in (3, 7):
        ts = np.asarray(ddpm.inference_timesteps(n))
        x = np.full((1, 2, 2, 4),
                    np.sqrt(acp[ts[0]]) * C + np.sqrt(1 - acp[ts[0]]) * d,
                    np.float32)
        st = unipc.init_state(x.shape)
        for t in ts:
            a = np.sqrt(acp[t])
            sig = np.sqrt(1 - acp[t])
            eps = ((x - a * C) / sig).astype(np.float32)
            x, st = unipc.step(s, int(t), x, eps, st, num_inference_steps=n)
            x = np.asarray(x)
        np.testing.assert_allclose(x, C, rtol=2e-4, atol=2e-4)


def test_first_step_matches_ddim_eta0():
    """count = 0: no history -> order-1 predictor == DDIM eta=0 step."""
    s = ddpm.make_schedule()
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    st = unipc.init_state(lat.shape)
    got, _ = unipc.step(s, 980, lat, eps, st, num_inference_steps=50)
    expect = ddim.step(s, 980, lat, eps, np.zeros_like(lat),
                       num_inference_steps=50)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-5)


def test_corrector_with_no_new_information_is_order1_replay():
    """m_t == m0 == m1 -> all divided differences vanish; the corrected
    sample equals the order-1 (DDIM-like) transition replayed from
    last_sample — independent of the incoming (uncorrected) sample."""
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    n = 50
    t, t0 = 960, 980
    lam = lambda tt: float(np.log(np.sqrt(acp[tt]) / np.sqrt(1 - acp[tt])))
    h_c = lam(t) - lam(t0)

    rng = np.random.RandomState(1)
    m = rng.randn(1, 2, 2, 4).astype(np.float32)
    last = rng.randn(1, 2, 2, 4).astype(np.float32)
    st = unipc.init_state(m.shape)
    st = {**st, "m0": m, "m1": m, "last_sample": last,
          "h_last": np.float32(h_c), "h_prev": np.float32(h_c),
          "count": np.int32(2)}
    # incoming sample chosen so the model's x0-pred is exactly m again
    a_t, sig_t = np.sqrt(acp[t]), np.sqrt(1 - acp[t])
    x_in = (a_t * m + sig_t * 0.3).astype(np.float32)
    eps = ((x_in - a_t * m) / sig_t).astype(np.float32)
    _, st_out = unipc.step(s, t, x_in, eps, st, num_inference_steps=n)
    corrected = np.asarray(st_out["last_sample"])

    expect = np.asarray(ddim.step(s, t0, last,
                                  ((last - np.sqrt(acp[t0]) * m)
                                   / np.sqrt(1 - acp[t0])).astype(np.float32),
                                  np.zeros_like(last),
                                  num_inference_steps=(t0 - t) and n))
    # ddim.step uses its own prev_t = t0 - 1000//n = t; same transition
    np.testing.assert_allclose(corrected, expect, rtol=2e-4, atol=2e-4)


def test_pipeline_unipc(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    img = sdt.generate("a cat", sampler_name="unipc", **kw)
    assert img.shape == (H, W, 3)
    img2 = sdt.generate("a cat", sampler_name="unipc", **kw)
    assert (img == img2).all()  # deterministic
    img3 = sdt.generate("a cat", sampler_name="unipc", **{**kw, "seed": 99})
    assert (img != img3).any()
    img_d = sdt.generate("a cat", sampler_name="dpm++", **kw)
    assert (img != img_d).any()  # corrector actually changes the trajectory
