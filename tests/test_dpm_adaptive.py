"""DPM adaptive sampler (k-diffusion ``dpm_solver_adaptive``; A1111
"DPM adaptive") — bounded ``while_loop`` with PID step-size control.

Module-level exactness: for a constant-eps model the order-2/3 pair has
zero local error, every step is accepted with a growing h, and the
integration telescopes to the exact ODE solution X' = X + (sigma_end -
sigma_start) * eps.  Pipeline-level: runs, deterministic, its own
trajectory, img2img entry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, dpm_adaptive


def test_constant_eps_integrates_exactly():
    schedule = ddpm.make_schedule()
    sig_all = np.asarray(ddpm.sigmas_all(schedule))
    c = 0.37
    x_vp = jnp.full((1, 2, 2, 1), 0.5, jnp.float32)
    t0 = schedule.num_train_timesteps - 1
    noises = jnp.zeros((64, 1, 2, 2, 1), jnp.float32)

    out = dpm_adaptive.sample(
        schedule, x_vp, jnp.int32(t0),
        lambda x, t: jnp.full_like(x, c), noises, max_iters=64, eta=0.0)

    sig0, sig_end = sig_all[t0], sig_all[0]
    x0_k = 0.5 * np.sqrt(1.0 + sig0**2)
    want = (x0_k + (sig_end - sig0) * c) / np.sqrt(1.0 + sig_end**2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3)


def test_budget_bounds_iterations():
    """A 1-iteration budget cannot reach sigma_min: the output stays far
    from the converged solution but is finite (the documented bound)."""
    schedule = ddpm.make_schedule()
    x_vp = jnp.full((1, 2, 2, 1), 0.5, jnp.float32)
    t0 = schedule.num_train_timesteps - 1
    noises = jnp.zeros((64, 1, 2, 2, 1), jnp.float32)

    full = dpm_adaptive.sample(schedule, x_vp, jnp.int32(t0),
                               lambda x, t: jnp.full_like(x, 0.37),
                               noises, max_iters=64, eta=0.0)
    capped = dpm_adaptive.sample(schedule, x_vp, jnp.int32(t0),
                                 lambda x, t: jnp.full_like(x, 0.37),
                                 noises[:1], max_iters=1, eta=0.0)
    assert np.isfinite(np.asarray(capped)).all()
    assert np.abs(np.asarray(capped) - np.asarray(full)).max() > 1e-3


def test_pipeline_dpm_adaptive(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=12,
              return_latents=True)
    img, lat = sdt.generate("a photo of a dog", sampler_name="dpm_adaptive",
                            seed=3, **kw)
    assert img.shape == (16, 16, 3) and np.isfinite(lat).all()
    _, lat2 = sdt.generate("a photo of a dog", sampler_name="dpm_adaptive",
                           seed=3, **kw)
    np.testing.assert_array_equal(lat, lat2)
    _, lat_e = sdt.generate("a photo of a dog", sampler_name="euler",
                            seed=3, **kw)
    assert np.abs(lat - lat_e).max() > 1e-3


def test_pipeline_dpm_adaptive_img2img(tiny_cfg, tiny_models,
                                       tiny_tokenizer):
    init = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    img = sdt.generate("a photo of a dog", sampler_name="dpm_adaptive",
                       models=tiny_models, tokenizer=tiny_tokenizer,
                       config=tiny_cfg, height=16, width=16,
                       n_inference_steps=10, seed=5, input_image=init,
                       strength=0.6)
    assert img.shape == (16, 16, 3)
