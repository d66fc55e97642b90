"""DPM fast sampler (k-diffusion ``sample_dpm_fast`` via ``DPMSolver
.dpm_solver_fast``; A1111's "DPM fast").

TPU-native extension (the reference supports only DDPM,
``sd/pipeline.py:142-143``).  The solver splits the full sigma range
into ``m = floor(n/3) + 1`` segments, uniform in t-space (t = -log
sigma), and runs one exponential-integrator step per segment — order 3
for most segments, with the remainder rule ``[3]*(m-2) + [2, 1]`` when
``n % 3 == 0`` else ``[3]*(m-1) + [n % 3]`` — so the model-eval budget
is exactly ``n``.  A1111 passes the FULL training sigma range (not the
step grid's ends) and ancestral eta.

TPU mapping: every boundary / interior eval point is quantized to the
nearest training timestep (the house convention — sampling/dpm2.py) and
all integrator coefficients are precomputed on the host per segment, so
the compiled loop is ONE uniform body (3 model evals + a fused linear
combine) regardless of order — lower-order segments zero the unused
difference coefficients (their extra evals run but cost only the final
1-2 segments).  State stays in Karras space (X = x / sqrt(abar)) across
the whole loop.

Order-p update over a segment [t0, t1'] with h = t1' - t0 (k-diffusion
``dpm_solver_{1,2,3}_step``):
    u1 = X - sigma(s1) * expm1(r1 h) * eps0                        (p>=2)
    u2 = X - sigma(s2) * expm1(r2 h) * eps0
           - sigma(s2) (r2/r1) (expm1(r2 h)/(r2 h) - 1) (eps1 - eps0)
                                                                   (p=3)
    X' = X - sigma(t1') expm1(h) eps0 - c1 (eps1 - eps0)
           - c2 (eps2 - eps0)
    c1 = sigma(t1')/(2 r1) expm1(h)               [p=2; r1 = 1/2]
    c1 = 0, c2 = sigma(t1')/r2 (expm1(h)/h - 1)   [p=3; r1,r2 = 1/3,2/3]
with the ancestral split (eta > 0) lowering t1 to t1' and re-injecting
``su``-scaled noise after the step.
"""

from __future__ import annotations

import numpy as np

from .ddpm import DDPMSchedule, sigmas_all as _sigmas_all


def build_plan(schedule: DDPMSchedule, n: int, eta: float = 1.0) -> dict:
    """Host-precomputed per-segment tables (everything static).

    Returns dict of (m,)-arrays: quantized eval timesteps ``t0 s1 s2``,
    coefficients ``u1c u2c0 u2c1 e0c c1 c2``, noise scales ``su``, plus
    ``t_exit`` (the final boundary timestep, for the VP mapping back),
    and the img2img entry maps ``start_t`` / ``seg_start`` ((n,)-arrays
    over the pipeline's uniform step grid).

    ``eta`` follows A1111's ancestral default (1.0); k-diffusion's
    signature default is 0 (pure ODE).
    """
    if n < 1:
        raise ValueError(f"dpm_fast needs n >= 1, got {n}")
    sig_all = np.asarray(_sigmas_all(schedule), np.float64)
    log_all = np.log(sig_all)
    t_all = -log_all  # k-diffusion t-space; increasing as sigma falls

    def q(t):
        """Quantize a t-space point to the nearest training timestep."""
        return int(np.abs(t_all - t).argmin())

    m = n // 3 + 1
    if n % 3 == 0:
        orders = [3] * (m - 2) + [2, 1] if m >= 2 else [min(n, 3)]
    else:
        orders = [3] * (m - 1) + [n % 3]
    ts = np.linspace(t_all[-1], t_all[0], m + 1)  # sigma_max -> sigma_min
    tq = np.asarray([q(t) for t in ts], np.int32)  # quantized boundaries

    cols = {k: np.zeros(m, np.float64) for k in
            ("u1c", "u2c0", "u2c1", "e0c", "c1", "c2", "su")}
    t0s = np.zeros(m, np.int32)
    s1s = np.zeros(m, np.int32)
    s2s = np.zeros(m, np.int32)
    for i, order in enumerate(orders):
        i0, i1 = int(tq[i]), int(tq[i + 1])
        sig0, sig1 = sig_all[i0], sig_all[i1]
        if eta:
            # k-diffusion get_ancestral_step, then the lowered boundary
            var_up = min(eta, 1.0) ** 2 * sig1**2 \
                * max(sig0**2 - sig1**2, 0.0) / max(sig0**2, 1e-20)
            sd = np.sqrt(max(sig1**2 - var_up, 1e-20))
            i1_ = q(-np.log(sd))
            i1_ = max(i1_, int(tq[-1]))  # clamp at the exit boundary
            su = np.sqrt(max(sig1**2 - sig_all[i1_] ** 2, 0.0))
        else:
            i1_, su = i1, 0.0
        t0, t1_ = t_all[i0], t_all[i1_]
        h = max(t1_ - t0, 1e-8)
        r1 = 1.0 / 3.0 if order == 3 else 0.5
        r2 = 2.0 / 3.0
        s1 = q(t0 + r1 * h) if order >= 2 else i0
        s2 = q(t0 + r2 * h) if order == 3 else i0
        sig_n = sig_all[i1_]
        t0s[i], s1s[i], s2s[i] = i0, s1, s2
        c = cols
        c["su"][i] = su
        c["e0c"][i] = sig_n * np.expm1(h)
        if order >= 2:
            c["u1c"][i] = sig_all[s1] * np.expm1(r1 * h)
        if order == 2:
            c["c1"][i] = sig_n / (2.0 * r1) * np.expm1(h)
        if order == 3:
            c["u2c0"][i] = sig_all[s2] * np.expm1(r2 * h)
            # dimensionless phi-2 factor — k-diffusion dpm_solver_3_step
            # has NO trailing h here (caught in review: an extra *h made
            # u2's correction ~h x too large)
            c["u2c1"][i] = sig_all[s2] * (r2 / r1) \
                * (np.expm1(r2 * h) / (r2 * h) - 1.0)
            c["c2"][i] = sig_n / r2 * (np.expm1(h) / h - 1.0)

    # img2img entry: map each uniform-grid start step to the segment
    # boundary with the nearest training timestep (the same grid the
    # pipeline noised the latents on)
    from .ddpm import inference_timesteps

    grid = np.asarray(inference_timesteps(n), np.int64)
    seg_start = np.asarray(
        [int(np.abs(tq[:-1].astype(np.int64) - g).argmin()) for g in grid],
        np.int32)
    start_t = tq[seg_start].astype(np.int32)
    return {
        "m": m,
        "t0": t0s, "s1": s1s, "s2": s2s,
        **{k: v.astype(np.float32) for k, v in cols.items()},
        "t_exit": int(tq[-1]),
        "seg_start": seg_start, "start_t": start_t,
    }
