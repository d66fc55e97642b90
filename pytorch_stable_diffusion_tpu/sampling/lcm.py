"""LCM sampler — Latent Consistency Model multi-step scheduler.

Enables 2-8 step generation from LCM-distilled weights: either a native
LCM checkpoint or any SD/SDXL checkpoint with an LCM-LoRA merged in
(``weights/lora.py`` / ``--lora`` already handles the merge), typically
with CFG off (``do_cfg=False``) or a low scale (1.0-2.0).

The reference (``/root/reference/sd/ddpm.py``) has no consistency-model
sampler; this follows the published LCM formulation (Luo et al. 2023,
"Latent Consistency Models", eq. 9's multi-step sampling) in the
conventions the ecosystem standardized on (diffusers ``LCMScheduler``):

  * Timesteps live on the distillation grid: the teacher's
    ``original_steps`` (default 50) uniform DDIM positions
    ``arange(1, original_steps+1) * (T // original_steps) - 1`` descending,
    thinned to ``num_inference_steps`` by integer striding from the top.
  * Each step evaluates the consistency function
        f(x_t, t) = c_skip(t) * x_t + c_out(t) * x0_hat(x_t, eps)
    with the boundary-condition scalings of the distillation objective
    (sigma_data = 0.5, timestep_scaling = 10):
        c_skip = sd^2 / (s^2 + sd^2),  c_out = s / sqrt(s^2 + sd^2),
        s = t * timestep_scaling.
  * Between steps, fresh noise re-diffuses f to the next grid point:
        x_{t_prev} = sqrt(abar_prev) * f + sqrt(1 - abar_prev) * z;
    the final step returns f itself.

Pure functions over ``ddpm.DDPMSchedule``; ``t`` may be traced.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import ddpm

#: boundary-condition constants of the LCM distillation objective
SIGMA_DATA = 0.5
TIMESTEP_SCALING = 10.0
#: the teacher grid the public LCM / LCM-LoRA weights were distilled on
ORIGINAL_STEPS = 50


def inference_timesteps(num_inference_steps: int,
                        num_train_timesteps: int = 1000,
                        original_steps: int = ORIGINAL_STEPS) -> np.ndarray:
    """Descending int32 timesteps on the LCM distillation grid.

    The grid is ``(arange(1, original_steps+1) * T//original_steps) - 1``
    (i.e. 19, 39, ..., 999 for the standard 50/1000), reversed, then
    strided by ``len(grid) // num_inference_steps`` from the top — the
    ecosystem-standard thinning, which always keeps t=999 first.
    """
    if num_inference_steps > original_steps:
        raise ValueError(
            f"LCM supports at most original_steps={original_steps} inference "
            f"steps (the distillation grid), got {num_inference_steps}")
    k = num_train_timesteps // original_steps
    grid = np.arange(1, original_steps + 1, dtype=np.int64) * k - 1
    stride = len(grid) // num_inference_steps
    ts = grid[::-1][::stride][:num_inference_steps]
    return ts.astype(np.int32)


def boundary_scalings(t):
    """(c_skip, c_out) at (possibly traced) timestep ``t``."""
    s = t.astype(jnp.float32) * TIMESTEP_SCALING if hasattr(t, "astype") \
        else jnp.float32(t) * TIMESTEP_SCALING
    sd2 = SIGMA_DATA * SIGMA_DATA
    c_skip = sd2 / (s * s + sd2)
    c_out = s / jnp.sqrt(s * s + sd2)
    return c_skip, c_out


def step(schedule: ddpm.DDPMSchedule, t, latents, eps, noise, *,
         num_inference_steps: int, prev_t):
    """One LCM multi-step iteration.

    ``prev_t`` is the next grid timestep (< 0 on the final step, where the
    result is the consistency output itself and ``noise`` is unused).
    """
    del num_inference_steps  # grid comes from inference_timesteps via prev_t
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)

    abar_t = schedule.alphas_cumprod[t]
    x0 = (lat - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    c_skip, c_out = boundary_scalings(t)
    denoised = c_skip * lat + c_out * x0

    abar_prev = ddpm._alpha_bar_prev(schedule, prev_t)
    renoised = (jnp.sqrt(abar_prev) * denoised
                + jnp.sqrt(1.0 - abar_prev) * noise.astype(jnp.float32))
    out = jnp.where(prev_t >= 0, renoised, denoised)
    return out.astype(dt)
