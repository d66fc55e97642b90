"""LMS sampler (linear multistep over the probability-flow ODE) — the
classic k-diffusion ``sample_lms``.

TPU-native extension (the reference supports only DDPM,
``sd/pipeline.py:142-143``).  Per step the derivative in Karras sigma-space
is d = eps_hat; the update integrates the Lagrange interpolation of the
last ``order`` derivatives exactly over [sigma_i, sigma_{i+1}]:

    X_{i+1} = X_i + sum_j c_{i,j} d_{i-j},
    c_{i,j} = ∫ prod_{k!=j} (tau - s_{i-k}) / (s_{i-j} - s_{i-k}) dtau.

k-diffusion evaluates the integral numerically (``integrate.quad``); the
integrand is a polynomial of degree < order, so we integrate it EXACTLY
with numpy polynomial arithmetic — once, on the host, for every step AND
every warmup order (the current order is min(steps-done, order), which with
a traced img2img ``start_step`` is only known inside the loop).  The
compiled loop then just gathers a coefficient row and contracts it with the
derivative history riding in the ``fori_loop`` carry.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ddpm import DDPMSchedule, _alpha_bar_prev, sigmas_all

ORDER = 4  # k-diffusion's default


def sigma_grid(schedule: DDPMSchedule, timesteps: np.ndarray) -> np.ndarray:
    """Karras sigmas at the inference timesteps, with the terminal 0."""
    sig = sigmas_all(schedule)[np.asarray(timesteps)]
    return np.append(sig, 0.0)


def coeff_table(schedule: DDPMSchedule, timesteps: np.ndarray,
                order: int = ORDER) -> np.ndarray:
    """(n_steps, order, order) float32: ``tab[i, o-1, j]`` is the exact
    Lagrange-basis integral for step i at current order o; entries with
    j >= o (and orders unreachable at step i) stay 0, so a fixed-size
    contraction with the history buffer is always correct."""
    s = sigma_grid(schedule, timesteps)
    n = len(s) - 1
    tab = np.zeros((n, order, order), np.float64)
    for i in range(n):
        for o in range(1, min(i + 1, order) + 1):
            nodes = [s[i - k] for k in range(o)]
            for j in range(o):
                poly = np.poly1d([1.0])
                for k in range(o):
                    if k != j:
                        poly = poly * np.poly1d([1.0, -nodes[k]]) \
                            / (nodes[j] - nodes[k])
                integ = poly.integ()
                tab[i, o - 1, j] = integ(s[i + 1]) - integ(s[i])
    return tab.astype(np.float32)


def init_state(lat_shape, order: int = ORDER):
    """Derivative history, newest first (zeros until warm)."""
    return jnp.zeros((order,) + tuple(lat_shape), jnp.float32)


def step(schedule: DDPMSchedule, table, step_i, start_step, t, latents, eps,
         hist, *, prev_t):
    """One LMS step.  ``table`` is ``coeff_table`` as a device array;
    ``step_i``/``start_step``/``t``/``prev_t`` may be traced."""
    order = hist.shape[0]
    lat = latents.astype(jnp.float32)
    a_t = schedule.alphas_cumprod[t]
    a_next = _alpha_bar_prev(schedule, prev_t)

    hist = jnp.concatenate([eps.astype(jnp.float32)[None], hist[:-1]], axis=0)
    cur = jnp.clip(step_i - start_step + 1, 1, order)
    coeffs = table[step_i, cur - 1]  # (order,), zeros past the current order
    delta = jnp.tensordot(coeffs, hist, axes=1)

    x_karras = lat / jnp.sqrt(a_t)
    return (jnp.sqrt(a_next) * (x_karras + delta)).astype(latents.dtype), hist
