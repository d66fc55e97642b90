"""SDE-DPM-Solver++(3M) (k-diffusion's "DPM++ 3M SDE"; sampling/dpm.py
step_sde_3m).  Validated through the same invariants as the 2M variants:
constant-x0 trajectories land exactly, the coefficient pair is
variance-preserving at every step, and the final step is noiseless.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, dpm

H = W = 16
N_STEPS = 4


def test_constant_x0_lands_exactly():
    """Model x0-prediction constant C: corrections vanish and every step
    maps a correctly-noised marginal to the next one; the trajectory ends
    on C for any step count (noise injected en route included)."""
    schedule = ddpm.make_schedule()
    n = 7
    ts = ddpm.karras_timesteps(schedule, n)
    prevs = np.append(ts[1:], -1).astype(np.int32)
    rng = np.random.RandomState(0)
    C = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    d = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)

    a0 = schedule.alphas_cumprod[ts[0]]
    x = jnp.sqrt(a0) * C + jnp.sqrt(1.0 - a0) * d
    st = dpm.init_state_3m(x.shape)
    for t, p in zip(ts, prevs):
        a_t = schedule.alphas_cumprod[t]
        alpha, sigma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        eps = (x - alpha * C) / sigma  # model consistent with x0 == C
        z = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
        x, st = dpm.step_sde_3m(schedule, t, x, eps, z, st,
                                num_inference_steps=n, prev_t=int(p))
    np.testing.assert_allclose(np.asarray(x), np.asarray(C), rtol=1e-4,
                               atol=1e-4)


def test_variance_preserving_coefficients():
    schedule = ddpm.make_schedule()
    ts = ddpm.inference_timesteps(10)
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    for i in range(9):
        a_t, a_n = abar[ts[i]], abar[ts[i + 1]]
        s_t, s_n = np.sqrt(1 - a_t), np.sqrt(1 - a_n)
        e_h = (np.sqrt(a_t) * s_n) / (s_t * np.sqrt(a_n))
        cx = (s_n / s_t) * e_h           # x coefficient
        cz = s_n * np.sqrt(1 - e_h**2)   # noise coefficient
        np.testing.assert_allclose((cx * s_t) ** 2 + cz**2, s_n**2,
                                   rtol=1e-10)


def test_final_step_noiseless():
    schedule = ddpm.make_schedule()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    st = dpm.init_state_3m(x.shape)
    st = {**st, "count": jnp.int32(3)}  # pretend warm history
    a, _ = dpm.step_sde_3m(schedule, 10, x, eps, jnp.ones_like(x), st,
                           num_inference_steps=4, prev_t=jnp.int32(-1))
    b, _ = dpm.step_sde_3m(schedule, 10, x, eps, jnp.zeros_like(x), st,
                           num_inference_steps=4, prev_t=jnp.int32(-1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and it IS the predicted x0
    a_t = schedule.alphas_cumprod[10]
    x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(x0), rtol=1e-5)


def test_pipeline_dpm3m(tiny_models, tiny_tokenizer, tiny_cfg):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    img = sdt.generate("a cat", "a dog", sampler_name="dpm++_3m_sde", **kw)
    ref = sdt.generate("a cat", "a dog", sampler_name="dpm++_sde", **kw)
    assert img.shape == (H, W, 3)
    assert (img != ref).any()
    # karras grid + img2img compose like every sampler
    init = np.zeros((H, W, 3), np.uint8)
    img2 = sdt.generate("a cat", sampler_name="dpm++_3m_sde",
                        timestep_spacing="karras", input_image=init,
                        strength=0.8, **{k: v for k, v in kw.items()})
    assert img2.shape == (H, W, 3)
