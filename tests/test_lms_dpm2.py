"""LMS and DPM2/DPM2-a samplers (sampling/lms.py, sampling/dpm2.py).

No reference analog (the reference supports only DDPM); semantics follow
k-diffusion's ``sample_lms`` / ``sample_dpm_2`` / ``sample_dpm_2_ancestral``.
The LMS coefficient table is validated against closed-form integral
identities (partition of unity; exactness on polynomial derivatives), the
samplers against trajectory invariants, and both through the pipeline.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, dpm2, euler, lms

H = W = 16
N_STEPS = 5


# ------------------------------------------------------------- LMS table
def test_lms_coeffs_partition_of_unity():
    """Basis polynomials sum to 1, so the coefficients must sum to the
    integration interval s_{i+1} - s_i for every reachable order."""
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(10)
    s = lms.sigma_grid(schedule, ts)
    tab = lms.coeff_table(schedule, ts)
    for i in range(10):
        for o in range(1, min(i + 1, 4) + 1):
            np.testing.assert_allclose(tab[i, o - 1].sum(), s[i + 1] - s[i],
                                       rtol=1e-4)
    # unreachable orders stay zero
    assert tab[0, 1:].sum() == 0.0


def test_lms_exact_on_linear_derivative():
    """A derivative linear in sigma is integrated exactly at order >= 2:
    X_{i+1} - X_i == a (s1-s0) + b/2 (s1^2-s0^2)."""
    schedule = ddpm.make_schedule()
    ts = ddpm.karras_timesteps(schedule, 8)  # non-uniform grid
    s = lms.sigma_grid(schedule, ts)
    tab = lms.coeff_table(schedule, ts)
    a, b = 0.7, -0.3
    for i in range(1, 8):  # step 0 is order-1 (Euler), exact only for const
        o = min(i + 1, 4)
        d_hist = np.array([a + b * s[i - j] for j in range(4)])
        d_hist[o:] = 0.0
        delta = (tab[i, o - 1] * d_hist).sum()
        want = a * (s[i + 1] - s[i]) + 0.5 * b * (s[i + 1] ** 2 - s[i] ** 2)
        np.testing.assert_allclose(delta, want, rtol=2e-4, atol=1e-7)


def test_lms_step_constant_eps_matches_euler_chain():
    """With a constant eps the LMS update equals the Euler update at every
    step and any warmup order (Lagrange of a constant is the constant)."""
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(6)
    prevs = np.append(ts[1:], -1).astype(np.int32)
    tab = jnp.asarray(lms.coeff_table(schedule, ts))
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    hist = lms.init_state(x.shape)
    for i, (t, p) in enumerate(zip(ts, prevs)):
        x_e = euler.step(schedule, t, x, eps, None, num_inference_steps=6,
                         prev_t=p)
        x, hist = lms.step(schedule, tab, jnp.int32(i), jnp.int32(0),
                           jnp.int32(int(t)), x, eps, hist,
                           prev_t=jnp.int32(int(p)))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_e),
                                   rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------- DPM2
def test_dpm2_mid_timesteps_between_grid_points():
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(10)
    for anc in (False, True):
        mid = dpm2.mid_timesteps(schedule, ts, ancestral=anc)
        assert mid.shape == (10,)
        # each midpoint lies strictly between its step's endpoints
        for i in range(9):
            lo = 0 if anc else ts[i + 1]  # ancestral sigma_down <= sigma_next
            assert lo <= mid[i] < ts[i]


def test_dpm2_constant_eps_equals_euler():
    """Constant-eps model: midpoint derivative == initial derivative, so
    the DPM2 full step IS the Euler step."""
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(6)
    prevs = np.append(ts[1:], -1).astype(np.int32)
    mid = dpm2.mid_timesteps(schedule, ts)
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    for i, (t, p) in enumerate(zip(ts, prevs)):
        pred_mid = euler.step(schedule, t, x, eps, None,
                              num_inference_steps=6, prev_t=int(mid[i]))
        assert pred_mid.shape == x.shape
        full2 = euler.step(schedule, t, x, eps, None,
                           num_inference_steps=6, prev_t=p)
        x = full2  # constant eps: eps2 == eps -> dpm2 == euler
    assert np.isfinite(np.asarray(x)).all()


def test_dpm2a_final_step_is_noiseless():
    schedule = ddpm.make_schedule()
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    n1 = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    a = dpm2.step_ancestral_second(schedule, 10, x, eps, n1,
                                   prev_t=jnp.int32(-1))
    b = dpm2.step_ancestral_second(schedule, 10, x, eps, jnp.zeros_like(n1),
                                   prev_t=jnp.int32(-1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# -------------------------------------------------------------- pipeline
@pytest.mark.parametrize("name", ["lms", "dpm2", "dpm2_a", "dpm++_2s_a"])
def test_pipeline_new_samplers(tiny_models, tiny_tokenizer, tiny_cfg, name):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    img = sdt.generate("a cat", "a dog", sampler_name=name, **kw)
    ref = sdt.generate("a cat", "a dog", sampler_name="euler", **kw)
    assert img.shape == (H, W, 3)
    assert (img != ref).any()


@pytest.mark.parametrize("name", ["lms", "dpm2"])
def test_pipeline_new_samplers_karras_img2img(tiny_models, tiny_tokenizer,
                                              tiny_cfg, name):
    init = np.zeros((H, W, 3), np.uint8)
    img = sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                       config=tiny_cfg, n_inference_steps=N_STEPS, height=H,
                       width=W, seed=0, sampler_name=name,
                       timestep_spacing="karras", input_image=init,
                       strength=0.8)
    assert img.shape == (H, W, 3)


# --------------------------------------------------------- DPM++ 2S a
def test_dpm2sa_constant_eps_equals_dpm2a():
    """With a constant-eps model the midpoint x0 estimate equals the
    initial one, so the x0-form exponential step coincides with DPM2-a's
    eps-form step: X' = x0 + sigma_down * eps for both."""
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(6)
    prevs = np.append(ts[1:], -1).astype(np.int32)
    mid = dpm2.mid_timesteps(schedule, ts, ancestral=True)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    noise = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    from pytorch_stable_diffusion_tpu.sampling import dpm
    for i in range(5):  # final step is the caller's Euler fallback
        t, p, m = int(ts[i]), int(prevs[i]), int(mid[i])
        pred_mid = euler.step(schedule, t, x, eps, None,
                              num_inference_steps=6, prev_t=m)
        got = dpm.step_2s_ancestral_second(schedule, t, x, pred_mid, eps,
                                           m, noise, prev_t=p)
        want = dpm2.step_ancestral_second(schedule, t, x, eps, noise,
                                          prev_t=p)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        x = got


def test_dpm2sa_constant_x0_contracts_exactly():
    """For a model whose x0 prediction is a constant C, the noiseless step
    satisfies X' - C = (sigma_down/sigma) (X - C) in Karras space."""
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(8)
    mid = dpm2.mid_timesteps(schedule, ts, ancestral=True)
    from pytorch_stable_diffusion_tpu.sampling import dpm
    from pytorch_stable_diffusion_tpu.sampling.ddpm import _alpha_bar_prev
    rs = np.random.RandomState(4)
    C = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)

    def eps_of(lat, t):  # eps consistent with x0 == C
        a = float(schedule.alphas_cumprod[t])
        return (lat - np.sqrt(a) * C) / np.sqrt(1.0 - a)

    t, p, m = int(ts[2]), int(ts[3]), int(mid[2])
    eps = eps_of(x, t)
    pred_mid = euler.step(schedule, t, x, eps, None, num_inference_steps=8,
                          prev_t=m)
    got = dpm.step_2s_ancestral_second(schedule, t, x, pred_mid,
                                       eps_of(pred_mid, m), m,
                                       jnp.zeros_like(x), prev_t=p)
    a_t = float(schedule.alphas_cumprod[t])
    a_n = float(_alpha_bar_prev(schedule, p))
    sig = np.sqrt((1 - a_t) / a_t)
    sig_n = np.sqrt((1 - a_n) / a_n)
    var_up = sig_n**2 * (sig**2 - sig_n**2) / sig**2
    sig_down = np.sqrt(sig_n**2 - var_up)
    X = np.asarray(x) / np.sqrt(a_t)
    want = np.sqrt(a_n) * (np.asarray(C) + (sig_down / sig)
                           * (X - np.asarray(C)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_dpm2sa_final_step_is_x0_and_noiseless():
    """prev_t < 0: sigma_down = sigma_up = 0, so the step returns the
    midpoint x0 estimate exactly and ignores the noise."""
    schedule = ddpm.make_schedule()
    from pytorch_stable_diffusion_tpu.sampling import dpm
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    n1 = jnp.asarray(rs.randn(1, 4, 4, 4), jnp.float32)
    m = 5
    pred_mid = euler.step(schedule, 10, x, eps, None,
                          num_inference_steps=6, prev_t=m)
    a = dpm.step_2s_ancestral_second(schedule, 10, x, pred_mid, eps, m, n1,
                                     prev_t=jnp.int32(-1))
    b = dpm.step_2s_ancestral_second(schedule, 10, x, pred_mid, eps, m,
                                     jnp.zeros_like(n1),
                                     prev_t=jnp.int32(-1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a_m = float(schedule.alphas_cumprod[m])
    sig_m = np.sqrt((1 - a_m) / a_m)
    x0_mid = np.asarray(pred_mid) / np.sqrt(a_m) - sig_m * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(a), x0_mid, rtol=2e-4, atol=2e-5)
