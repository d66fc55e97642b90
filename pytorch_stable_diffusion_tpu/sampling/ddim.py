"""DDIM sampler (Song et al. 2021) — TPU-native extension.

The reference supports only DDPM (``sd/pipeline.py:142-143`` rejects other
names); DDIM is the standard fewer-step/deterministic alternative users of
the 20-step configs expect.  Shares the scaled-linear schedule and timestep
subsampling with sampling/ddpm.py so ``n_inference_steps`` means the same
thing under both samplers.

eta=0 (default): fully deterministic ODE sampling — ``noise`` is ignored.
eta=1: matches DDPM's ancestral variance.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ddpm import DDPMSchedule, _alpha_bar_prev


def step(schedule: DDPMSchedule, t, latents, eps, noise, *,
         num_inference_steps: int, eta: float = 0.0, prev_t=None):
    """One DDIM step; ``t`` may be traced.  Shapes as ddpm.step."""
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t = schedule.alphas_cumprod[t]
    a_prev = _alpha_bar_prev(schedule, prev_t)

    x0 = (lat - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    sigma = eta * jnp.sqrt((1.0 - a_prev) / (1.0 - a_t)) \
        * jnp.sqrt(1.0 - a_t / a_prev)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, min=0.0)) * eps
    out = jnp.sqrt(a_prev) * x0 + dir_xt
    if eta != 0.0:
        # final-step gate: prev_t >= 0 == (t > 0) on the uniform grid, and
        # stays correct on Karras grids whose last timestep is > 0
        out = out + jnp.where(prev_t >= 0, sigma, 0.0) * noise.astype(jnp.float32)
    return out.astype(dt)
