"""Euler and Euler-ancestral samplers (Karras et al. 2022) — TPU-native
extensions.

The reference supports only DDPM (``sd/pipeline.py:142-143``); Euler is the
standard fast ODE sampler and Euler-ancestral its stochastic variant.  Both
share the scaled-linear schedule and timestep subsampling with
sampling/ddpm.py, so ``n_inference_steps`` means the same thing everywhere.

Formulation: the DDPM latent x_t = sqrt(abar_t) * (x0 + sigma_t * eps) with
sigma_t = sqrt((1 - abar_t)/abar_t) maps to Karras sigma-space via
X = x_t / sqrt(abar_t).  There the probability-flow ODE derivative is
d = (X - denoised)/sigma = eps_hat, so one Euler step is
X' = X + (sigma_next - sigma) * eps_hat, mapped back with sqrt(abar_next).
The final step has prev_t < 0 -> abar_next = 1, sigma_next = 0, collapsing
to the predicted x0 exactly.

Euler-ancestral splits sigma_next into a deterministic sigma_down and a
noise injection sigma_up (k-diffusion's get_ancestral_step):
  sigma_up   = sqrt(sigma_next^2 * (sigma^2 - sigma_next^2) / sigma^2)
  sigma_down = sqrt(sigma_next^2 - sigma_up^2)

Both steps are pure functions usable inside ``lax.scan``/``fori_loop``;
noise is caller-supplied (ignored by plain Euler).
"""

from __future__ import annotations

import jax.numpy as jnp

from .ddpm import DDPMSchedule, _alpha_bar_prev


def _sigmas(schedule: DDPMSchedule, t, prev_t):
    a_t = schedule.alphas_cumprod[t]
    a_next = _alpha_bar_prev(schedule, prev_t)
    sigma = jnp.sqrt((1.0 - a_t) / a_t)
    sigma_next = jnp.sqrt((1.0 - a_next) / a_next)
    return a_t, a_next, sigma, sigma_next


def step(schedule: DDPMSchedule, t, latents, eps, noise, *,
         num_inference_steps: int, prev_t=None):
    """One deterministic Euler step; ``t`` may be traced.  ``noise`` is
    accepted for samplers-API uniformity and ignored."""
    del noise
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t, a_next, sigma, sigma_next = _sigmas(schedule, t, prev_t)
    x_karras = lat / jnp.sqrt(a_t)
    x_karras = x_karras + (sigma_next - sigma) * eps
    return (jnp.sqrt(a_next) * x_karras).astype(dt)


def step_heun_correct(schedule: DDPMSchedule, t, latents, eps, eps2, *,
                      num_inference_steps: int, prev_t=None):
    """Second-order (Heun / improved-Euler) correction step.

    ``eps`` is the model's prediction at ``(latents, t)``; ``eps2`` its
    prediction at the plain Euler result (``step(...)``) and the *next*
    timestep.  The trapezoidal derivative (eps + eps2)/2 replaces Euler's
    one-sided eps — k-diffusion's ``sample_heun``.  On the final step
    (sigma_next = 0) the correction is skipped and the Euler result (the
    predicted x0, see ``step``) is kept, k-diffusion's final-step rule.

    TPU-native extension; the reference supports only DDPM
    (``sd/pipeline.py:142-143``).
    """
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t, a_next, sigma, sigma_next = _sigmas(schedule, t, prev_t)
    x_karras = lat / jnp.sqrt(a_t)
    d1 = eps.astype(jnp.float32)
    d_prime = 0.5 * (d1 + eps2.astype(jnp.float32))
    d = jnp.where(prev_t < 0, d1, d_prime)
    return (jnp.sqrt(a_next) * (x_karras + (sigma_next - sigma) * d)).astype(dt)


def step_ancestral(schedule: DDPMSchedule, t, latents, eps, noise, *,
                   num_inference_steps: int, prev_t=None):
    """One Euler-ancestral step; ``t`` may be traced.  Shapes as ddpm.step."""
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t, a_next, sigma, sigma_next = _sigmas(schedule, t, prev_t)
    var_up = sigma_next**2 * jnp.clip(sigma**2 - sigma_next**2, min=0.0) \
        / jnp.maximum(sigma**2, 1e-20)
    sigma_up = jnp.sqrt(var_up)
    sigma_down = jnp.sqrt(jnp.clip(sigma_next**2 - var_up, min=0.0))

    x_karras = lat / jnp.sqrt(a_t)
    x_karras = x_karras + (sigma_down - sigma) * eps
    # noise only before the final step (sigma_next=0 there); prev_t >= 0
    # == (t > 0) on the uniform grid, correct on Karras grids too
    x_karras = x_karras + jnp.where(prev_t >= 0, sigma_up, 0.0) \
        * noise.astype(jnp.float32)
    return (jnp.sqrt(a_next) * x_karras).astype(dt)
