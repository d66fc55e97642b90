r"""UniPC sampler (Zhao et al. 2023) — TPU-native extension.

Unified predictor-corrector, solver order 2, ``bh2`` variant, in
data-prediction (x0) space — the standard high-quality few-step
configuration.  The reference supports only DDPM
(``/root/reference/sd/pipeline.py:142-143``).

Exponential-integrator background (shared with sampling/dpm.py):
  alpha_t = sqrt(abar_t), sigma_t = sqrt(1 - abar_t),
  lambda_t = log(alpha_t / sigma_t), h = lambda_next - lambda_t,
  and the exact transition is
    x_next = (sigma_next/sigma_t) x + alpha_next \int e^{lam - lam_next}
             x0(lam) dlam
  over [lambda_t, lambda_next].  UniPC approximates x0(lam) from the model
  evaluations it already has:

  * **Predictor** (uni_p, order 2): uses x0 at the current point (m0) and the
    previous point (m1).  With u = expm1(-h), rk = -h_prev/h,
    D1 = (m1 - m0)/rk:
      x_next = (sigma_next/sigma_t) x - alpha_next u m0
               - alpha_next B_h rho_p D1,
    B_h = u (bh2), rho_p = (u/(-h) - 1)/u.  Exact when x0(lam) is linear
    (tested), reducing to DPM++(2M) with its 1/(2r) weight replaced by the
    exact collocation weight.
  * **Corrector** (uni_c): on arriving at a predicted sample with a fresh
    model evaluation m_t, the transition that produced it is re-solved with
    m_t included (rk = 1).  First correction is order 1 (rho_c = 1/2);
    afterwards order 2 using the extra history point (2x2 collocation
    solve).  The model evaluation is NOT repeated on the corrected sample —
    UniPC's defining free-lunch property: same model-eval count as a pure
    multistep solver, one order higher accuracy.

The final step is forced to first order with no further correction
(``lower_order_final``), and e^{-h} terms are formed algebraically as
(alpha_t sigma_next)/(sigma_t alpha_next) so sigma_next = 0 produces exactly
x_next = m (no infinities) — same degeneracy handling as sampling/dpm.py.

Exactness invariants used by tests (tests/test_unipc.py):
  * constant x0-prediction: every update maps alpha C + sigma d ->
    alpha_next C + sigma_next d (lands on C at t=0 for any step count);
  * x0 linear in lambda with manufactured exact history: the order-2
    predictor is exact to fp tolerance.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ddpm import DDPMSchedule, _alpha_bar_prev


def init_state(latents_shape, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "m0": jnp.zeros(latents_shape, dtype),   # x0-pred at the last point
        "m1": jnp.zeros(latents_shape, dtype),   # x0-pred one point earlier
        "last_sample": jnp.zeros(latents_shape, dtype),  # sample at the last
        "h_last": jnp.float32(0.0),   # lambda step of the last transition
        "h_prev": jnp.float32(0.0),   # lambda step of the one before it
        "count": jnp.int32(0),
    }


def _coeffs(schedule: DDPMSchedule, t, prev_t):
    a_t = schedule.alphas_cumprod[t]
    a_n = _alpha_bar_prev(schedule, prev_t)
    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_n, sigma_n = jnp.sqrt(a_n), jnp.sqrt(1.0 - a_n)
    lam_t = jnp.log(alpha_t / jnp.maximum(sigma_t, 1e-20))
    lam_n = jnp.log(alpha_n / jnp.maximum(sigma_n, 1e-20))
    h = lam_n - lam_t
    # e^{-h} without the sigma_n -> 0 singularity
    exp_neg_h = (alpha_t * sigma_n) / (sigma_t * alpha_n)
    return alpha_t, sigma_t, alpha_n, sigma_n, h, exp_neg_h


def _predict(x, m0, d1, sigma_t, alpha_n, sigma_n, h, u, second):
    """uni_p, bh2.  u = expm1(-h) (algebraic).  d1 = (m1 - m0)/rk."""
    rho_p = (u / (-h) - 1.0) / jnp.where(u == 0, 1.0, u)
    base = (sigma_n / jnp.maximum(sigma_t, 1e-20)) * x - alpha_n * u * m0
    return jnp.where(second, base - alpha_n * u * rho_p * d1, base)


def _correct(last_sample, m0, m1, m_t, sigma_t0, alpha_t, sigma_t, h, u,
             rk_prev, use_order2):
    """uni_c, bh2: re-solve the last transition (t0 -> t, step h, u =
    expm1(-h)) including the fresh evaluation m_t at the arrival point
    (rk = 1).  m0/m1 are the x0-preds at t0 and the point before it;
    rk_prev = (lam_{t-1} - lam_{t0})/h.

    order 1 (first correction): x = base - alpha_t B_h (1/2) D1_t
    order 2: collocation weights from the 2x2 system
        [[1, 1], [rk_prev, 1]] @ [rho1, rho2] = [b1, b2]
      with hh = -h, b1 = (u/hh - 1)/B_h, b2 = 2 (b1/hh... ) — expanded below.
    """
    hh = -h
    b_h = u  # bh2
    h_phi_1 = u
    h_phi_2 = h_phi_1 / hh - 1.0
    h_phi_3 = h_phi_2 / hh - 0.5
    b1 = h_phi_2 / jnp.where(b_h == 0, 1.0, b_h)          # i=1 (factorial 1)
    b2 = h_phi_3 * 2.0 / jnp.where(b_h == 0, 1.0, b_h)    # i=2 (factorial 2)

    d1_prev = (m1 - m0) / jnp.where(rk_prev == 0, 1.0, rk_prev)
    d1_t = m_t - m0  # rk = 1

    # order-1 weights: rho = [0.5] on D1_t
    corr1 = 0.5 * d1_t
    # order-2: solve [[1,1],[rk_prev,1]] rho = [b1,b2]
    det = 1.0 - rk_prev
    det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    rho1 = (b1 - b2) / det
    rho2 = (b2 - rk_prev * b1) / det
    corr2 = rho1 * d1_prev + rho2 * d1_t

    corr = jnp.where(use_order2, corr2, corr1)
    base = (sigma_t / jnp.maximum(sigma_t0, 1e-20)) * last_sample \
        - alpha_t * u * m0
    return base - alpha_t * b_h * corr


def step(schedule: DDPMSchedule, t, latents, eps, state, *,
         num_inference_steps: int, prev_t=None) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One UniPC step: correct the arrival at ``t`` (if history exists), then
    predict the sample at the next timestep.  ``t`` may be traced.  ``eps``
    is the model output at (``latents``, ``t``) — the *uncorrected* sample,
    matching UniPC's eval-reuse scheme."""
    dt = latents.dtype
    x = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    alpha_t, sigma_t, alpha_n, sigma_n, h, exp_neg_h = _coeffs(
        schedule, t, prev_t)
    u = exp_neg_h - 1.0  # expm1(-h), algebraic in the schedule tables

    m_t = (x - sigma_t * eps) / alpha_t  # x0-pred at the uncorrected sample

    # ---- corrector for the transition that brought us here (h_last) -------
    h_c = state["h_last"]
    u_c = jnp.expm1(-h_c)
    # sigma at the departure point t0:  lam_t0 = lam_t - h_c
    lam_t = jnp.log(alpha_t / jnp.maximum(sigma_t, 1e-20))
    lam_t0 = lam_t - h_c
    # alpha/sigma from lambda: sigma = 1/sqrt(1+e^{2 lam}), alpha = e^lam sigma
    sigma_t0 = jnp.reciprocal(jnp.sqrt(1.0 + jnp.exp(2.0 * lam_t0)))
    rk_prev = -state["h_prev"] / jnp.where(h_c == 0, 1.0, h_c)
    corrected = _correct(state["last_sample"], state["m0"], state["m1"], m_t,
                         sigma_t0, alpha_t, sigma_t, h_c, u_c, rk_prev,
                         use_order2=state["count"] > 1)
    x = jnp.where(state["count"] > 0, corrected, x)

    # ---- predictor for t -> prev_t ----------------------------------------
    final = prev_t < 0
    second = jnp.logical_and(state["count"] > 0, jnp.logical_not(final))
    rk = -state["h_last"] / jnp.where(h == 0, 1.0, h)
    d1 = (state["m0"] - m_t) / jnp.where(rk == 0, 1.0, rk)
    x_next = _predict(x, m_t, d1, sigma_t, alpha_n, sigma_n, h, u, second)

    new_state = {
        "m0": m_t,
        "m1": state["m0"],
        "last_sample": x,
        "h_last": jnp.where(final, state["h_last"], h).astype(jnp.float32),
        "h_prev": jnp.where(final, state["h_prev"],
                            state["h_last"]).astype(jnp.float32),
        "count": state["count"] + 1,
    }
    return x_next.astype(dt), new_state
