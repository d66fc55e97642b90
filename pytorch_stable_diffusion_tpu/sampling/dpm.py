"""DPM-Solver++(2M) sampler (Lu et al. 2022) — TPU-native extension.

Second-order multistep solver in data-prediction (x0) space: the standard
choice for high-quality few-step sampling (the 20-step batched config).
Deterministic; shares the schedule and timestep subsampling with ddpm.py.

Math (data-prediction form, eps-model converted to x0):
  alpha_t = sqrt(abar_t), sigma_t = sqrt(1 - abar_t),
  lambda_t = log(alpha_t / sigma_t), h = lambda_next - lambda_t.
  order 1:  x_next = (sigma_next/sigma_t) x - alpha_next (e^{-h} - 1) x0
            (algebraically identical to a DDIM eta=0 step — tested).
  order 2:  D = (1 + 1/(2r)) x0 - 1/(2r) x0_prev,  r = h_prev / h,
            x_next = (sigma_next/sigma_t) x - alpha_next (e^{-h} - 1) D.
The final step (prev_t < 0 => sigma_next = 0) degenerates to x_next = x0:
e^{-h} is computed algebraically as (alpha_t sigma_next)/(sigma_t alpha_next)
so no infinities appear, and the last step is forced to first order
(the usual lower_order_final rule).

Exactness invariant used by tests: for a model whose x0-prediction is a
constant C, every step maps alpha_t C + sigma_t d -> alpha_next C +
sigma_next d, so the trajectory lands on C exactly at t=0 for ANY step
count.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ddpm import DDPMSchedule, _alpha_bar_prev


def init_state(latents_shape, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "prev_x0": jnp.zeros(latents_shape, dtype),
        "prev_h": jnp.float32(0.0),
        "count": jnp.int32(0),
    }


def step(schedule: DDPMSchedule, t, latents, eps, state, *,
         num_inference_steps: int, prev_t=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One DPM-Solver++(2M) step; ``t`` may be traced."""
    dt = latents.dtype
    x = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t = schedule.alphas_cumprod[t]
    a_n = _alpha_bar_prev(schedule, prev_t)
    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_n, sigma_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)

    x0 = (x - sigma_t * eps) / alpha_t

    lam_t = jnp.log(alpha_t / jnp.maximum(sigma_t, 1e-20))
    lam_n = jnp.log(alpha_n / jnp.maximum(sigma_n, 1e-20))
    h = lam_n - lam_t
    # e^{-h} without the sigma_n -> 0 singularity
    exp_neg_h = (alpha_t * sigma_n) / (sigma_t * alpha_n)

    final = prev_t < 0
    second = jnp.logical_and(state["count"] > 0, jnp.logical_not(final))
    r = state["prev_h"] / jnp.where(h == 0, 1.0, h)
    w = 1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
    d = jnp.where(second, (1.0 + w) * x0 - w * state["prev_x0"], x0)

    x_next = (sigma_n / jnp.maximum(sigma_t, 1e-20)) * x \
        - alpha_n * (exp_neg_h - 1.0) * d

    new_state = {
        "prev_x0": x0,
        "prev_h": jnp.where(final, state["prev_h"], h).astype(jnp.float32),
        "count": state["count"] + 1,
    }
    return x_next.astype(dt), new_state


def init_state_3m(latents_shape, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "x0_1": jnp.zeros(latents_shape, dtype),
        "x0_2": jnp.zeros(latents_shape, dtype),
        "h_1": jnp.float32(0.0),
        "h_2": jnp.float32(0.0),
        "count": jnp.int32(0),
    }


def step_sde_3m(schedule: DDPMSchedule, t, latents, eps, noise, state, *,
                num_inference_steps: int, prev_t=None
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One SDE-DPM-Solver++(3M) step (k-diffusion's "DPM++ 3M SDE",
    eta = 1): the exponential-integrator base update plus second/third
    order corrections from the x0 history in lambda-space.

    In VP parameterization (translated from k-diffusion's sigma-space
    form via X = x/alpha, sigma_k = sigma/alpha; their h equals our
    lambda difference):

      base:  x' = (sigma_n/sigma_t) e^{-h} x + alpha_n (1 - e^{-2h}) x0
             + sigma_n sqrt(1 - e^{-2h}) z
      3rd:   r0 = h_1/h, r1 = h_2/h,
             d1_0 = (x0 - x0_1)/r0, d1_1 = (x0_1 - x0_2)/r1,
             d1 = d1_0 + (d1_0 - d1_1) r0/(r0 + r1),
             d2 = (d1_0 - d1_1)/(r0 + r1),
             phi_2 = (e^{-2h} - 1)/(2h) + 1,  phi_3 = phi_2/(2h) - 1/2,
             x' += alpha_n (phi_2 d1 - phi_3 d2)
      2nd (one history entry): x' += alpha_n phi_2 (x0 - x0_1)/r0.

    The final step (prev_t < 0) collapses to x0 exactly (k-diffusion's
    ``sigma == 0`` special case — the corrections do NOT vanish
    algebraically there, so it is masked explicitly).  Variance
    preserving like step_sde: coefficient identity
    (sigma_n e^{-h}/sigma_t)^2 sigma_t^2 + sigma_n^2 (1 - e^{-2h})
    = sigma_n^2.
    """
    dt = latents.dtype
    x = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t = schedule.alphas_cumprod[t]
    a_n = _alpha_bar_prev(schedule, prev_t)
    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_n, sigma_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)

    x0 = (x - sigma_t * eps) / alpha_t

    lam_t = jnp.log(alpha_t / jnp.maximum(sigma_t, 1e-20))
    lam_n = jnp.log(alpha_n / jnp.maximum(sigma_n, 1e-20))
    final = prev_t < 0
    h = jnp.where(final, 1.0, lam_n - lam_t)  # safe h for the ratios
    exp_neg_h = (alpha_t * sigma_n) / (sigma_t * alpha_n)
    exp_neg_2h = exp_neg_h * exp_neg_h

    base = (sigma_n / jnp.maximum(sigma_t, 1e-20)) * exp_neg_h * x \
        + alpha_n * (1.0 - exp_neg_2h) * x0 \
        + sigma_n * jnp.sqrt(jnp.clip(1.0 - exp_neg_2h, min=0.0)) \
        * noise.astype(jnp.float32)

    h2 = 2.0 * h
    phi_2 = (exp_neg_2h - 1.0) / h2 + 1.0
    phi_3 = phi_2 / h2 - 0.5
    r0 = state["h_1"] / h
    r1 = state["h_2"] / h
    safe_r0 = jnp.where(r0 == 0, 1.0, r0)
    safe_r01 = jnp.where(r0 + r1 == 0, 1.0, r0 + r1)
    d1_0 = (x0 - state["x0_1"]) / safe_r0
    d1_1 = (state["x0_1"] - state["x0_2"]) / jnp.where(r1 == 0, 1.0, r1)
    d1 = d1_0 + (d1_0 - d1_1) * r0 / safe_r01
    d2 = (d1_0 - d1_1) / safe_r01

    third = jnp.logical_and(state["count"] > 1, jnp.logical_not(final))
    second = jnp.logical_and(state["count"] == 1, jnp.logical_not(final))
    corr = jnp.where(third, alpha_n * (phi_2 * d1 - phi_3 * d2),
                     jnp.where(second, alpha_n * phi_2 * d1_0, 0.0))

    x_next = jnp.where(final, x0, base + corr)

    new_state = {
        "x0_1": x0,
        "x0_2": state["x0_1"],
        "h_1": jnp.where(final, state["h_1"], h).astype(jnp.float32),
        "h_2": state["h_1"],
        "count": state["count"] + 1,
    }
    return x_next.astype(dt), new_state


def step_sde(schedule: DDPMSchedule, t, latents, eps, noise, state, *,
             num_inference_steps: int, prev_t=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One SDE-DPM-Solver++(2M) step (the community "DPM++ 2M SDE",
    midpoint variant): the 2M multistep update with an e^{-2h} memory
    decay on the current sample plus ancestral noise.

      x_next = (sigma_n/sigma_t) e^{-h} x
             + alpha_n (1 - e^{-2h}) D
             + sigma_n sqrt(1 - e^{-2h}) z,
      D = x0 + (1/(2r)) (x0 - x0_prev),  r = h_prev / h  (midpoint; D = x0
      on the first and final steps).

    Variance-preserving by construction: the x-coefficient contributes
    sigma_n^2 e^{-2h} and the noise term sigma_n^2 (1 - e^{-2h}), so a
    correctly-noised marginal stays correctly noised.  The final step
    (prev_t < 0) has sigma_n = 0 and e^{-h} = 0, collapsing to x0 exactly
    with zero injected noise.  ``noise``: standard normal, same shape.
    """
    dt = latents.dtype
    x = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t = schedule.alphas_cumprod[t]
    a_n = _alpha_bar_prev(schedule, prev_t)
    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_n, sigma_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)

    x0 = (x - sigma_t * eps) / alpha_t

    lam_t = jnp.log(alpha_t / jnp.maximum(sigma_t, 1e-20))
    lam_n = jnp.log(alpha_n / jnp.maximum(sigma_n, 1e-20))
    h = lam_n - lam_t
    # e^{-h} without the sigma_n -> 0 singularity
    exp_neg_h = (alpha_t * sigma_n) / (sigma_t * alpha_n)
    exp_neg_2h = exp_neg_h * exp_neg_h

    final = prev_t < 0
    second = jnp.logical_and(state["count"] > 0, jnp.logical_not(final))
    r = state["prev_h"] / jnp.where(h == 0, 1.0, h)
    w = 1.0 / (2.0 * jnp.where(r == 0, 1.0, r))
    d = jnp.where(second, x0 + w * (x0 - state["prev_x0"]), x0)

    x_next = (sigma_n / jnp.maximum(sigma_t, 1e-20)) * exp_neg_h * x \
        + alpha_n * (1.0 - exp_neg_2h) * d \
        + sigma_n * jnp.sqrt(jnp.clip(1.0 - exp_neg_2h, min=0.0)) \
        * noise.astype(jnp.float32)

    new_state = {
        "prev_x0": x0,
        "prev_h": jnp.where(final, state["prev_h"], h).astype(jnp.float32),
        "count": state["count"] + 1,
    }
    return x_next.astype(dt), new_state


def step_2s_ancestral_second(schedule: DDPMSchedule, t, latents, pred_mid,
                             eps_mid, mid_t, noise, *, prev_t):
    """DPM-Solver++(2S) ancestral full step (k-diffusion
    ``sample_dpmpp_2s_ancestral``; A1111's "DPM++ 2S a").

    TPU-native extension (the reference supports only DDPM,
    ``sd/pipeline.py:142-143``).  Single-step second-order solver in
    x0-prediction space: the caller first integrates to the log-space
    midpoint between sigma and sigma_down (``euler.step`` with
    ``prev_t = mid_t`` — algebraically x0 + sigma_mid * eps, identical to
    k-diffusion's r=1/2 substep) and evaluates the model there; this
    function then applies the exponential-integrator full step

        X' = (sigma_down / sigma) * X + (1 - sigma_down/sigma) * x0_mid

    (k-diffusion's ``x = (sigma_fn(t_next)/sigma_fn(t)) x - expm1(-h)
    denoised_2`` with h = log(sigma/sigma_down)) and injects the ancestral
    sigma_up noise.  The final step (prev_t < 0) is handled by the caller's
    Euler fallback, matching k-diffusion's ``sigma_down == 0`` branch.

    ``pred_mid``/``eps_mid``: the midpoint latent (DDPM space) and the
    model's eps prediction there; ``mid_t``: the host-quantized midpoint
    training timestep (``dpm2.mid_timesteps(..., ancestral=True)`` — the
    geometric-mean midpoint of sigma and sigma_down, exactly DPM++ 2S's
    r = 1/2 point).
    """
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    a_t = schedule.alphas_cumprod[t]
    a_next = _alpha_bar_prev(schedule, prev_t)
    sigma = jnp.sqrt((1.0 - a_t) / a_t)
    sigma_next = jnp.sqrt((1.0 - a_next) / a_next)

    # k-diffusion get_ancestral_step (eta = 1)
    var_up = sigma_next**2 * jnp.clip(sigma**2 - sigma_next**2, min=0.0) \
        / jnp.maximum(sigma**2, 1e-20)
    sigma_up = jnp.sqrt(var_up)
    sigma_down = jnp.sqrt(jnp.clip(sigma_next**2 - var_up, min=0.0))

    # midpoint x0 estimate from the second eval
    a_mid = schedule.alphas_cumprod[mid_t]
    sigma_mid = jnp.sqrt((1.0 - a_mid) / a_mid)
    x_mid = pred_mid.astype(jnp.float32) / jnp.sqrt(a_mid)
    x0_mid = x_mid - sigma_mid * eps_mid.astype(jnp.float32)

    ratio = sigma_down / jnp.maximum(sigma, 1e-20)
    x_karras = lat / jnp.sqrt(a_t)
    x_karras = ratio * x_karras + (1.0 - ratio) * x0_mid
    x_karras = x_karras + jnp.where(prev_t >= 0, sigma_up, 0.0) \
        * noise.astype(jnp.float32)
    return (jnp.sqrt(a_next) * x_karras).astype(dt)
