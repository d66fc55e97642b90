"""DPM adaptive sampler (k-diffusion ``sample_dpm_adaptive`` /
``DPMSolver.dpm_solver_adaptive``; A1111's "DPM adaptive").

TPU-native extension (the reference supports only DDPM,
``sd/pipeline.py:142-143``).  An adaptive-step exponential integrator in
t-space (t = -log sigma): each iteration takes an order-2 and an order-3
step over the proposed interval (sharing evals — 3 model calls total),
estimates the local error from their difference, and a PID controller
(k-diffusion ``PIDStepSizeController``; defaults P=0, I=1, D=0 with the
``1 + atan(x - 1)`` limiter) accepts or rejects the step and rescales h.

JIT mapping: ONE ``lax.while_loop`` whose predicate is "not yet at
sigma_min AND under the iteration budget" — adaptivity is a traced
control flow, not a recompile.  The continuous state rides in Karras
space (X = x * sqrt(1 + sigma^2) of the VP latent); sigma/abar
conversions are closed-form (abar = 1/(1 + sigma^2)), and only the
UNet's conditioning timestep is quantized (nearest training index — the
house convention, sampling/dpm2.py).  ``max_iters`` (the pipeline's
``n_inference_steps``) bounds the loop; k-diffusion's A1111 config runs
to tolerance and typically needs ~15-35 accepted steps at the default
rtol/atol.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .ddpm import DDPMSchedule, sigmas_all as _sigmas_all


def sample(schedule: DDPMSchedule, x_vp, t_entry, eval_eps, noises, *,
           max_iters: int, rtol: float = 0.05, atol: float = 0.0078,
           h_init: float = 0.05, eta: float = 1.0, s_noise: float = 1.0,
           accept_safety: float = 0.81, pcoeff: float = 0.0,
           icoeff: float = 1.0, dcoeff: float = 0.0):
    """Integrate ``x_vp`` (VP latents at training timestep ``t_entry``,
    traced) down to sigma_min.

    ``eval_eps(x_vp, t_idx)`` -> model epsilon (the pipeline's UNet+CFG
    closure); ``noises``: (max_iters, ...) pre-drawn ancestral noise,
    indexed by iteration.  Returns VP latents at the exit sigma.
    """
    sig_all = np.asarray(_sigmas_all(schedule), np.float64)
    log_sig = jnp.asarray(np.log(sig_all), jnp.float32)  # ascending in t
    idx_all = jnp.arange(len(sig_all), dtype=jnp.float32)
    t_end = float(-np.log(sig_all[0]))  # sigma_min boundary (static)

    # PID exponents (k-diffusion: order' = 1.5 when eta else the solver
    # order 3; inverse-error history powers)
    ord_eff = 1.5 if eta else 3.0
    b1 = (pcoeff + icoeff + dcoeff) / ord_eff
    b2 = -(pcoeff + 2.0 * dcoeff) / ord_eff
    b3 = dcoeff / ord_eff

    def sigma(tt):
        return jnp.exp(-tt)

    def cond_idx(tt):
        """Nearest training timestep for the UNet conditioning."""
        c = jnp.interp(-tt, log_sig, idx_all)
        return jnp.clip(jnp.round(c), 0, len(sig_all) - 1).astype(jnp.int32)

    def eval_at(Xp, tt):
        """eps at the Karras-space state Xp whose noise level is tt."""
        sig = sigma(tt)
        vp = (Xp / jnp.sqrt(1.0 + sig * sig)).astype(jnp.float32)
        return eval_eps(vp, cond_idx(tt)).astype(jnp.float32)

    abar_e = schedule.alphas_cumprod[t_entry]
    sig_e = jnp.sqrt((1.0 - abar_e) / abar_e)
    s0 = -jnp.log(jnp.maximum(sig_e, 1e-20))
    X0 = x_vp.astype(jnp.float32) * jnp.sqrt(1.0 + sig_e * sig_e)

    def pred(carry):
        X, X_prev, s, h, i1, i2, it = carry
        return (s < t_end - 1e-5) & (it < max_iters)

    def body(carry):
        X, X_prev, s, h, inv1, inv2, it = carry
        t = jnp.minimum(t_end, s + h)
        sig_s, sig_t = sigma(s), sigma(t)
        if eta:
            var_up = min(eta, 1.0) ** 2 * sig_t**2 \
                * jnp.maximum(sig_s**2 - sig_t**2, 0.0) \
                / jnp.maximum(sig_s**2, 1e-20)
            sd = jnp.sqrt(jnp.maximum(sig_t**2 - var_up, 1e-20))
            t_ = jnp.minimum(t_end, -jnp.log(sd))
            su = jnp.sqrt(jnp.maximum(sig_t**2 - sigma(t_) ** 2, 0.0))
        else:
            t_, su = t, jnp.float32(0.0)
        h_ = jnp.maximum(t_ - s, 1e-8)
        r1, r2 = 1.0 / 3.0, 2.0 / 3.0
        s1, s2 = s + r1 * h_, s + r2 * h_
        eps0 = eval_at(X, s)
        u1 = X - sigma(s1) * jnp.expm1(r1 * h_) * eps0
        eps1 = eval_at(u1, s1)
        # order-2 step at r1=1/3 (shares eps1) and full order-3 step —
        # k-diffusion's dpm_solver_23 error pair
        x_low = X - sigma(t_) * jnp.expm1(h_) * eps0 \
            - sigma(t_) / (2.0 * r1) * jnp.expm1(h_) * (eps1 - eps0)
        u2 = X - sigma(s2) * jnp.expm1(r2 * h_) * eps0 \
            - sigma(s2) * (r2 / r1) \
            * (jnp.expm1(r2 * h_) / (r2 * h_) - 1.0) * (eps1 - eps0)
        eps2 = eval_at(u2, s2)
        x_high = X - sigma(t_) * jnp.expm1(h_) * eps0 \
            - sigma(t_) / r2 * (jnp.expm1(h_) / h_ - 1.0) * (eps2 - eps0)

        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(X_prev)))
        err = jnp.linalg.norm((x_low - x_high) / delta) \
            / math.sqrt(x_low.size)
        inv0 = 1.0 / (err + 1e-8)
        first = it == 0
        i1 = jnp.where(first, inv0, inv1)
        i2 = jnp.where(first, inv0, inv2)
        factor = inv0**b1 * i1**b2 * i2**b3
        factor = 1.0 + jnp.arctan(factor - 1.0)  # the PID limiter
        accept = factor >= accept_safety

        X_new = jnp.where(accept,
                          x_high + su * s_noise * noises[it].astype(
                              jnp.float32), X)
        X_prev_new = jnp.where(accept, x_low, X_prev)
        s_new = jnp.where(accept, t, s)
        inv1_new = jnp.where(accept, inv0, i1)
        inv2_new = jnp.where(accept, i1, i2)
        return (X_new, X_prev_new, s_new, h * factor, inv1_new, inv2_new,
                it + 1)

    h0 = jnp.float32(abs(h_init))
    X, _, s_fin, _, _, _, _ = jax.lax.while_loop(
        pred, body, (X0, X0, s0, h0, jnp.float32(1.0), jnp.float32(1.0),
                     jnp.int32(0)))
    sig_fin = sigma(s_fin)
    return (X / jnp.sqrt(1.0 + sig_fin * sig_fin)).astype(jnp.float32)
