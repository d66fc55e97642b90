"""PNDM / PLMS sampler (Liu et al. 2022, "Pseudo Numerical Methods for
Diffusion Models") — the original CompVis Stable-Diffusion default.

The reference (``/root/reference/sd/ddpm.py``) ships only DDPM; this adds
the pseudo-linear-multistep (PLMS) phase in the convention SD checkpoints
were historically sampled with (skip_prk_steps, as in the CompVis repo and
its descendants): an Adams-Bashforth linear multistep over epsilon
predictions on top of the DDIM transfer formula, with a 2-evaluation
trapezoidal warmup replacing the Runge-Kutta priming steps.

Eval schedule for n steps over the descending grid g[0..n-1]
(n+1 model evaluations total):

  j=0: eval at g0, step x(g0) -> temp x(g1) with raw eps (stores x(g0))
  j=1: eval the temp AT g1, average the two eps, redo g0 -> g1 from the
       stored sample (trapezoidal corrector)
  j>=2: eval at g[j-1], Adams-Bashforth over the last k stored eps:
       k=2: (3 e0 - e1)/2
       k=3: (23 e0 - 16 e1 + 5 e2)/12
       k>=4: (55 e0 - 59 e1 + 37 e2 - 9 e3)/24   (e0 newest)

Transfer formula (the PNDM phi — algebraically DDIM eta=0, arranged as in
the published implementation):

  x_prev = sqrt(a_prev/a_t) x
           - (a_prev - a_t) eps / (a_t sqrt(1-a_prev)
                                   + sqrt(a_t (1-a_t) a_prev))

Deterministic (no sampler noise).  Pure functions over
``ddpm.DDPMSchedule``; all branch selection is arithmetic on traced
scalars so the whole thing lives inside one ``lax.fori_loop``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .ddpm import DDPMSchedule, _alpha_bar_prev

#: Adams-Bashforth coefficient table, newest-first; row = warmup case
#:   0: j==1 trapezoid, 1: k==1 raw, 2: k==2, 3: k==3, 4: k>=4
_AB = jnp.asarray([
    [0.5, 0.5, 0.0, 0.0],
    [1.0, 0.0, 0.0, 0.0],
    [1.5, -0.5, 0.0, 0.0],
    [23 / 12, -16 / 12, 5 / 12, 0.0],
    [55 / 24, -59 / 24, 37 / 24, -9 / 24],
], jnp.float32)


def init_state(latents_shape, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "ets": jnp.zeros((4,) + tuple(latents_shape), dtype),  # newest first
        "n_ets": jnp.int32(0),
        "cur_sample": jnp.zeros(latents_shape, dtype),
    }


def combine_eps(state, eps, j) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Fold the fresh ``eps`` into the multistep history and return the
    Adams-Bashforth-combined epsilon for this step.  ``j``: 0-based loop
    index (traced); j == 1 is the trapezoidal corrector eval, which is
    NOT stored."""
    eps = eps.astype(jnp.float32)
    stacked = jnp.concatenate([eps[None], state["ets"][:3]], axis=0)
    append = (j != 1)
    new_ets = jnp.where(append, stacked, state["ets"])
    m = state["n_ets"] + append.astype(jnp.int32)
    case = jnp.where(j == 1, 0, jnp.clip(m, 1, 4))
    w = _AB[case]
    combined = jnp.tensordot(w, stacked, axes=1)
    return combined, {"ets": new_ets, "n_ets": m,
                      "cur_sample": state["cur_sample"]}


def transfer(schedule: DDPMSchedule, t, prev_t, sample, eps) -> jax.Array:
    """The PNDM phi: move ``sample`` from timestep ``t`` to ``prev_t``
    (prev_t < 0 => alpha_bar 1, the final hop to x0)."""
    a_t = schedule.alphas_cumprod[t]
    a_p = _alpha_bar_prev(schedule, prev_t)
    x = sample.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    denom = a_t * jnp.sqrt(1.0 - a_p) + jnp.sqrt(a_t * (1.0 - a_t) * a_p)
    return jnp.sqrt(a_p / a_t) * x - (a_p - a_t) * eps / denom


def step(schedule: DDPMSchedule, timesteps, prev_timesteps, i, start_step,
         latents, eps, state, *, n_steps: int):
    """One PLMS loop iteration; ``i`` runs start_step .. n_steps inclusive
    (one more iteration than grid points — the warmup double-eval).

    ``timesteps``/``prev_timesteps``: the (n_steps,) grids.  The caller's
    model evaluation must use ``eval_index(i, start_step)`` for the
    timestep of the CURRENT latents (see pipeline).
    """
    j = i - start_step
    te = eval_index(i, start_step)
    eps_c, state = combine_eps(state, eps, j)
    # j == 1 redoes g_s -> g_{s+1} from the stored sample; otherwise the
    # hop is te -> next grid point
    from_t = jnp.where(j == 1, timesteps[jnp.maximum(te - 1, 0)],
                       timesteps[te])
    to_t = jnp.where(j == 1, timesteps[te], prev_timesteps[te])
    sample = jnp.where(j == 1, state["cur_sample"],
                       latents.astype(jnp.float32))
    new_cur = jnp.where(j == 0, latents.astype(jnp.float32),
                        state["cur_sample"])
    out = transfer(schedule, from_t, to_t, sample, eps_c)
    return out.astype(latents.dtype), {**state, "cur_sample": new_cur}


def eval_index(i, start_step):
    """Grid index whose timestep the model is evaluated at in iteration
    ``i``: the sequence g_s, g_{s+1}, g_{s+1}, g_{s+2}, ... (the corrector
    re-evaluates g_{s+1})."""
    j = i - start_step
    return i - jnp.asarray(j >= 2, jnp.int32)
