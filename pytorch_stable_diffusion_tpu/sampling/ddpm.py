"""DDPM sampler — schedule as precomputed arrays, step/add_noise as pure
functions usable inside ``lax.scan``.

Behavior-parity target: ``/root/reference/sd/ddpm.py``.
  * scaled-linear betas: linspace(beta_start**0.5, beta_end**0.5, T)**2
    (``ddpm.py:43``); alpha-bar via cumprod (``ddpm.py:48``).
  * beta_start: the reference defaults to **0.000085** (``ddpm.py:30``) — a
    typo of the CompVis value 0.00085 that its own comment cites
    (v1-inference.yaml linear_start).  Our default is the *correct* 0.00085
    (the checkpoints were trained with it); bit-parity runs against the
    reference must pass ``beta_start=REFERENCE_BETA_START``, which
    ``SDConfig(reference_quirks=True)`` does (third reference quirk, next to
    the dropped GeGLU gate and the VAE attention un-transpose).
  * inference subsampling: (arange(n) * (T // n)).round()[::-1]
    (``ddpm.py:56-63``).
  * ancestral step (``ddpm.py:102-139``): predict x0, DDPM-paper posterior
    mean, posterior variance clamped >= 1e-20 (``ddpm.py:85``), noise added
    only for t > 0.
  * img2img strength: skip the first n*(1-strength) steps (``ddpm.py:90-99``)
    — realized here as a traced ``start_step`` so one compilation serves all
    strengths (SURVEY §7 "hard parts": scan with truncated schedules).

All schedule math is float32; noise tensors are caller-supplied so parity
tests can inject recorded values (SURVEY §7 RNG-parity resolution).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    betas: jax.Array           # (T,) f32
    alphas_cumprod: jax.Array  # (T,) f32
    num_train_timesteps: int

    def tree_flatten(self):
        return (self.betas, self.alphas_cumprod), self.num_train_timesteps

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


jax.tree_util.register_pytree_node(
    DDPMSchedule, DDPMSchedule.tree_flatten, DDPMSchedule.tree_unflatten
)


#: CompVis SD-1.x linear_start (v1-inference.yaml) — the value the released
#: checkpoints were trained with; our default.
BETA_START = 0.00085
#: The reference's typo'd default (ref ddpm.py:30): one zero too many.
#: Used only under SDConfig(reference_quirks=True) for bit-parity runs.
REFERENCE_BETA_START = 0.000085


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Rescale a beta schedule so SNR(T) == 0 exactly.

    "Common Diffusion Noise Schedules and Sample Steps are Flawed"
    (Lin et al. 2024), alg. 1: shift sqrt(alpha_bar) so the terminal value
    is 0, rescale so the initial value is preserved, recover betas.  For
    v-prediction checkpoints fine-tuned with zero-SNR (the paper's recipe,
    together with trailing spacing and guidance rescale)."""
    abar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt**2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


def make_schedule(num_train_timesteps: int = 1000, beta_start: float = BETA_START,
                  beta_end: float = 0.012,
                  zero_terminal_snr: bool = False) -> DDPMSchedule:
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
    if zero_terminal_snr:
        betas = rescale_zero_terminal_snr(betas)
    alphas_cumprod = np.cumprod(1.0 - betas)
    if zero_terminal_snr:
        # exactly 0 would blow up every eps->x0 form at t = T-1; pin the
        # terminal alpha-bar just above 0 (the ecosystem-standard 2^-24)
        alphas_cumprod[-1] = 2.0**-24
    return DDPMSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def inference_timesteps(num_inference_steps: int,
                        num_train_timesteps: int = 1000) -> np.ndarray:
    """Descending int32 timesteps (ddpm.py:56-63)."""
    ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * ratio).round()[::-1].copy()
    return ts.astype(np.int32)


def trailing_timesteps(num_inference_steps: int,
                       num_train_timesteps: int = 1000) -> np.ndarray:
    """Descending int32 timesteps with "trailing" spacing: the grid ends
    exactly at the terminal timestep T-1 (uniform spacing starts at
    ``(n-1)*(T//n)`` instead, under-noising the first step).  The sampling
    half of the zero-SNR recipe (Lin et al. 2024 §3.2); also what 1-4-step
    distilled checkpoints (SDXL-Turbo) are sampled with."""
    ratio = num_train_timesteps / num_inference_steps
    ts = np.round(np.arange(num_train_timesteps, 0, -ratio)) - 1
    return ts.astype(np.int32)


def sigmas_all(schedule: "DDPMSchedule") -> np.ndarray:
    """Karras sigma at every training timestep (ascending in t):
    sigma_t = sqrt((1 − abar_t)/abar_t) — the one conversion every
    sigma-space grid/sampler derives from."""
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    return np.sqrt((1.0 - abar) / abar)


def karras_timesteps(schedule: "DDPMSchedule", num_inference_steps: int,
                     rho: float = 7.0) -> np.ndarray:
    """Descending int32 timesteps on the Karras et al. 2022 sigma grid.

    sigma_i = (s_max^(1/rho) + i/(n-1) (s_min^(1/rho) - s_max^(1/rho)))^rho
    over the schedule's own sigma range, each mapped to the nearest
    training timestep in log-sigma (then forced strictly descending).  The
    quantization to integer timesteps keeps every sampler's
    integer-indexed schedule lookups exact; at n <= ~200 steps over 1000
    training timesteps the nearest-neighbor error is < half a timestep.
    Denser steps at low sigma — the spacing k-diffusion/A1111 "Karras"
    samplers use.
    """
    sig_all = sigmas_all(schedule)
    s_min, s_max = sig_all[0], sig_all[-1]
    ramp = np.linspace(0.0, 1.0, num_inference_steps)
    inv = 1.0 / rho
    sigmas = (s_max**inv + ramp * (s_min**inv - s_max**inv)) ** rho  # desc
    return _sigmas_to_timesteps(sig_all, sigmas)


def exponential_timesteps(schedule: "DDPMSchedule", num_inference_steps: int,
                          rho: float = 1.0) -> np.ndarray:
    """Descending int32 timesteps on k-diffusion's exponential sigma grid
    (``get_sigmas_exponential``): log-sigma uniform from sigma_max down to
    sigma_min.  ``rho != 1`` gives the polyexponential generalization
    (``get_sigmas_polyexponential``: the log-space ramp raised to rho).
    Same nearest-log-sigma timestep quantization as the Karras grid.
    """
    sig_all = sigmas_all(schedule)
    s_min, s_max = sig_all[0], sig_all[-1]
    ramp = np.linspace(1.0, 0.0, num_inference_steps) ** rho
    sigmas = np.exp(np.log(s_min) + ramp * (np.log(s_max) - np.log(s_min)))
    return _sigmas_to_timesteps(sig_all, sigmas)


def sgm_uniform_timesteps(num_inference_steps: int,
                          num_train_timesteps: int = 1000) -> np.ndarray:
    """Descending int32 timesteps with k-diffusion's "SGM Uniform" spacing
    (A1111 1.9 scheduler dropdown): ``linspace(T-1, 0, n+1)`` dropping the
    final point — uniform in timestep like "uniform" but anchored at the
    terminal timestep (like "trailing") with an evenly-shifted tail.
    """
    ts = np.round(np.linspace(num_train_timesteps - 1, 0.0,
                              num_inference_steps + 1))[:-1].astype(np.int64)
    for i in range(1, len(ts)):  # strictness after rounding
        ts[i] = min(ts[i], ts[i - 1] - 1)
    return np.clip(ts, 0, None).astype(np.int32)


def kl_optimal_timesteps(schedule: "DDPMSchedule",
                         num_inference_steps: int) -> np.ndarray:
    """Descending int32 timesteps on the KL-optimal sigma grid (A1111 1.10
    "KL Optimal"; the AYS paper's analytic SNR-equalizing schedule,
    arXiv:2404.14507 eq. 33): sigma_i = tan(lerp(atan(s_max), atan(s_min))).
    """
    sig_all = sigmas_all(schedule)
    s_min, s_max = sig_all[0], sig_all[-1]
    ramp = np.linspace(0.0, 1.0, num_inference_steps)
    sigmas = np.tan(ramp * np.arctan(s_min) + (1.0 - ramp) * np.arctan(s_max))
    return _sigmas_to_timesteps(sig_all, sigmas)


#: published Align-Your-Steps 10-step sigma tables (Sabour et al. 2024,
#: research.nvidia.com/labs/toronto-ai/AlignYourSteps) — the A1111 1.9
#: "Align Your Steps" scheduler resamples these log-linearly to n steps
AYS_SIGMAS_SD = (14.615, 6.475, 3.861, 2.697, 1.886,
                 1.396, 0.963, 0.652, 0.399, 0.152)
AYS_SIGMAS_SDXL = (14.615, 6.315, 3.771, 2.181, 1.342,
                   0.862, 0.555, 0.380, 0.234, 0.113)


def ays_timesteps(schedule: "DDPMSchedule", num_inference_steps: int,
                  table=AYS_SIGMAS_SD) -> np.ndarray:
    """Descending int32 timesteps on the Align-Your-Steps grid: the
    published 10-sigma table for the family, log-linearly resampled to n
    steps (A1111's ``loglinear_interp``), clipped to the schedule's own
    sigma range, then nearest-log-sigma quantized like every sigma grid.
    """
    t = np.asarray(table, np.float64)
    if num_inference_steps != len(t):
        xs = np.linspace(0.0, 1.0, len(t))
        ys = np.log(t[::-1])
        new = np.interp(np.linspace(0.0, 1.0, num_inference_steps), xs, ys)
        t = np.exp(new)[::-1].copy()
    sig_all = sigmas_all(schedule)
    sigmas = np.clip(t, sig_all[0], sig_all[-1])
    return _sigmas_to_timesteps(sig_all, sigmas)


def beta_timesteps(schedule: "DDPMSchedule", num_inference_steps: int,
                   alpha: float = 0.6, beta: float = 0.6) -> np.ndarray:
    """Descending int32 timesteps with Beta-distribution spacing
    ("Beta Sampling is All You Need", arXiv:2407.12173; A1111 1.10 "Beta"):
    sigma_i = s_min + ppf(1 - i/(n-1); alpha, beta) * (s_max - s_min) —
    steps concentrated at BOTH ends of the sigma range.
    """
    from scipy.stats import beta as _beta_dist
    sig_all = sigmas_all(schedule)
    s_min, s_max = sig_all[0], sig_all[-1]
    q = _beta_dist.ppf(1.0 - np.linspace(0.0, 1.0, num_inference_steps),
                       alpha, beta)
    sigmas = s_min + q * (s_max - s_min)
    return _sigmas_to_timesteps(sig_all, sigmas)


def _sigmas_to_timesteps(sigmas_all: np.ndarray,
                         sigmas: np.ndarray) -> np.ndarray:
    """Map a descending sigma grid to nearest training timesteps in
    log-sigma, forced strictly descending."""
    log_all = np.log(sigmas_all)
    out = [int(np.abs(log_all - np.log(s)).argmin()) for s in sigmas]
    # enforce strictly descending after quantization: forward pass caps at
    # prev-1 (may dip below 0 near the tail), backward pass lifts the tail
    # onto ..., 2, 1, 0
    prev = len(sigmas_all)
    for i, t in enumerate(out):
        out[i] = prev = min(t, prev - 1)
    out[-1] = max(out[-1], 0)
    for i in range(len(out) - 2, -1, -1):
        out[i] = max(out[i], out[i + 1] + 1)
    return np.asarray(out, np.int32)


def start_step_for_strength(num_inference_steps: int, strength: float) -> int:
    """ddpm.py:90-99: skip the first n*(1-strength) steps."""
    return num_inference_steps - int(num_inference_steps * strength)


def _alpha_bar_prev(schedule: DDPMSchedule, prev_t):
    safe = jnp.clip(prev_t, 0, schedule.num_train_timesteps - 1)
    return jnp.where(prev_t >= 0, schedule.alphas_cumprod[safe], 1.0)


def to_epsilon(schedule: DDPMSchedule, t, latents, model_output,
               prediction_type: str = "epsilon"):
    """Convert a model output to an epsilon prediction.

    prediction_type "epsilon" (SD-1.x, pass-through) or "v"
    (SD-2.x 768-v: x0 = a x - s v  =>  eps = s x + a v,
    a = sqrt(abar_t), s = sqrt(1 - abar_t))."""
    if prediction_type == "epsilon":
        return model_output
    if prediction_type != "v":
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    abar = schedule.alphas_cumprod[t]
    a, s = jnp.sqrt(abar), jnp.sqrt(1.0 - abar)
    return s * latents.astype(jnp.float32) + a * model_output.astype(jnp.float32)


def step(schedule: DDPMSchedule, t, latents, eps, noise, *,
         num_inference_steps: int, prev_t=None):
    """One ancestral DDPM step (ddpm.py:102-139).  ``t`` may be traced.

    latents/eps: (..., C); noise: same shape, standard normal (used iff t>0).
    """
    dt = latents.dtype
    lat = latents.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    if prev_t is None:  # uniform grid (identical to timesteps[i+1])
        prev_t = t - schedule.num_train_timesteps // num_inference_steps

    a_t = schedule.alphas_cumprod[t]
    a_prev = _alpha_bar_prev(schedule, prev_t)
    b_t = 1.0 - a_t
    b_prev = 1.0 - a_prev
    cur_alpha = a_t / a_prev
    cur_beta = 1.0 - cur_alpha

    x0 = (lat - jnp.sqrt(b_t) * eps) / jnp.sqrt(a_t)          # ddpm.py:116
    coeff_x0 = jnp.sqrt(a_prev) * cur_beta / b_t              # ddpm.py:120
    coeff_xt = jnp.sqrt(cur_alpha) * b_prev / b_t             # ddpm.py:123
    mean = coeff_x0 * x0 + coeff_xt * lat

    var = jnp.clip(b_prev / b_t * cur_beta, min=1e-20)        # ddpm.py:72-87
    # no noise on the final step.  The reference gates on t > 0
    # (ddpm.py:129-137); prev_t >= 0 is the identical set on the uniform
    # grid (last t is 0) and stays correct on non-uniform (Karras) grids
    # whose last timestep may be > 0.
    std = jnp.where(prev_t >= 0, jnp.sqrt(var), 0.0)
    return (mean + std * noise.astype(jnp.float32)).astype(dt)


def add_noise(schedule: DDPMSchedule, x0, t, noise):
    """Forward q(x_t | x_0) (ddpm.py:143-186).  ``t`` scalar or (B,)."""
    dt = x0.dtype
    a = schedule.alphas_cumprod[t]
    sqrt_a = jnp.sqrt(a)
    sqrt_1ma = jnp.sqrt(1.0 - a)
    # broadcast over trailing dims (reference unsqueezes, ddpm.py:164-186)
    while sqrt_a.ndim < x0.ndim:
        sqrt_a = sqrt_a[..., None]
        sqrt_1ma = sqrt_1ma[..., None]
    return (sqrt_a * x0.astype(jnp.float32)
            + sqrt_1ma * noise.astype(jnp.float32)).astype(dt)
