"""DPM2 and DPM2-ancestral samplers (k-diffusion ``sample_dpm_2`` /
``sample_dpm_2_ancestral``; A1111's "DPM2" / "DPM2 a").

TPU-native extension (the reference supports only DDPM,
``sd/pipeline.py:142-143``).  Second-order midpoint method in Karras
sigma-space: a half step to the log-space midpoint sigma, a second model
eval there, then the full step using the midpoint derivative.  The
midpoint sigma is quantized to the nearest training timestep on the host
(one (n_steps,) table) so the UNet's integer-timestep conditioning and
the integration sigma stay self-consistent — the same quantization the
Karras grid itself uses (``ddpm.karras_timesteps``).

The midpoint prediction and the plain-DPM2 full step are exactly
``euler.step`` with ``prev_t`` = the midpoint / next timestep, so only the
ancestral second half-step needs code here.  On the final step
(sigma_next = 0, log-midpoint undefined) both variants fall back to the
Euler step — k-diffusion's rule.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ddpm import DDPMSchedule, _alpha_bar_prev, sigmas_all as _sigma_all


def mid_timesteps(schedule: DDPMSchedule, timesteps: np.ndarray,
                  ancestral: bool = False) -> np.ndarray:
    """(n_steps,) int32: nearest training timestep to each step's log-space
    midpoint sigma.  Plain DPM2 midpoints between sigma_i and sigma_{i+1};
    the ancestral variant between sigma_i and its sigma_down.  The final
    step's entry is unused (Euler fallback) and set to 0."""
    sig_all = _sigma_all(schedule)
    ts = np.asarray(timesteps)
    sig = sig_all[ts]
    sig_next = np.append(sig[1:], 0.0)
    if ancestral:
        var_up = sig_next**2 * (sig**2 - sig_next**2) / np.maximum(sig**2,
                                                                   1e-20)
        lo = np.sqrt(np.maximum(sig_next**2 - var_up, 0.0))  # sigma_down
    else:
        lo = sig_next
    out = np.zeros(len(ts), np.int32)
    log_all = np.log(sig_all)
    for i in range(len(ts) - 1):  # final step: Euler fallback, entry unused
        s_mid = np.exp(0.5 * (np.log(sig[i]) + np.log(max(lo[i], 1e-20))))
        out[i] = int(np.abs(log_all - np.log(s_mid)).argmin())
    return out


def step_ancestral_second(schedule: DDPMSchedule, t, latents, eps_mid, noise,
                          *, prev_t):
    """DPM2-a full step: integrate to sigma_down with the midpoint
    derivative, then inject sigma_up noise (the k-diffusion ancestral
    split).  Caller handles the final-step Euler fallback."""
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    a_t = schedule.alphas_cumprod[t]
    a_next = _alpha_bar_prev(schedule, prev_t)
    sigma = jnp.sqrt((1.0 - a_t) / a_t)
    sigma_next = jnp.sqrt((1.0 - a_next) / a_next)

    var_up = sigma_next**2 * jnp.clip(sigma**2 - sigma_next**2, min=0.0) \
        / jnp.maximum(sigma**2, 1e-20)
    sigma_up = jnp.sqrt(var_up)
    sigma_down = jnp.sqrt(jnp.clip(sigma_next**2 - var_up, min=0.0))

    x_karras = lat / jnp.sqrt(a_t)
    x_karras = x_karras + (sigma_down - sigma) * eps_mid.astype(jnp.float32)
    x_karras = x_karras + jnp.where(prev_t >= 0, sigma_up, 0.0) \
        * noise.astype(jnp.float32)
    return (jnp.sqrt(a_next) * x_karras).astype(dt)
