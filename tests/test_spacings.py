"""A1111 1.9/1.10 scheduler-dropdown spacings: SGM Uniform, KL Optimal,
Align Your Steps, Beta (sampling/ddpm.py + pipeline timestep_spacing=...).

The reference supports only the uniform grid (sd/ddpm.py:56-63); these are
the community-standard quality grids.  Each is validated on published
formula properties, then one pipeline run each on the tiny config.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm

H = W = 16
N_STEPS = 3


def _sig(schedule, ts):
    abar = np.asarray(schedule.alphas_cumprod, np.float64)[ts]
    return np.sqrt((1.0 - abar) / abar)


# ------------------------------------------------------------ sgm_uniform
def test_sgm_uniform_grid():
    ts = ddpm.sgm_uniform_timesteps(20)
    assert ts.shape == (20,) and ts.dtype == np.int32
    assert ts[0] == 999 and (np.diff(ts) < 0).all()
    # n+1-point linspace dropped tail: matches round(linspace) directly
    want = np.round(np.linspace(999, 0, 21))[:-1]
    np.testing.assert_array_equal(ts, want.astype(np.int32))
    # distinct from both uniform (starts at 950) and trailing
    assert ddpm.inference_timesteps(20)[0] == 950
    assert not np.array_equal(ts, ddpm.trailing_timesteps(20))


def test_sgm_uniform_dense_n_stays_strict():
    ts = ddpm.sgm_uniform_timesteps(999)
    assert (np.diff(ts) < 0).all() and ts.min() >= 0


# ------------------------------------------------------------- kl_optimal
def test_kl_optimal_grid():
    schedule = ddpm.make_schedule()
    n = 16
    ts = ddpm.kl_optimal_timesteps(schedule, n)
    assert ts.shape == (n,) and (np.diff(ts) < 0).all()
    assert ts[0] == 999 and ts[-1] == 0
    # interior sigmas sit within a timestep's quantization of the analytic
    # tan(lerp(atan)) curve
    sig_all = np.sqrt((1 - np.asarray(schedule.alphas_cumprod, np.float64))
                      / np.asarray(schedule.alphas_cumprod, np.float64))
    ramp = np.linspace(0, 1, n)
    want = np.tan(ramp * np.arctan(sig_all[0])
                  + (1 - ramp) * np.arctan(sig_all[-1]))
    got = _sig(schedule, ts)
    # nearest-log-sigma quantization: log error bounded by the local grid gap
    for g, w, t in zip(got[1:-1], want[1:-1], ts[1:-1]):
        gap = abs(np.log(sig_all[min(t + 1, 999)]) - np.log(sig_all[t - 1]))
        assert abs(np.log(g) - np.log(w)) <= gap


# -------------------------------------------------------------------- ays
def test_ays_ten_steps_hits_published_table():
    schedule = ddpm.make_schedule()
    ts = ddpm.ays_timesteps(schedule, 10)
    got = _sig(schedule, ts)
    # each quantized sigma within 2% of the published table entry
    np.testing.assert_allclose(got, ddpm.AYS_SIGMAS_SD, rtol=0.02)
    assert ts[0] == 999  # 14.615 is this schedule's sigma_max


def test_ays_resample_preserves_endpoints_and_order():
    schedule = ddpm.make_schedule()
    for n in (5, 10, 25):
        ts = ddpm.ays_timesteps(schedule, n)
        assert ts.shape == (n,) and (np.diff(ts) < 0).all()
        got = _sig(schedule, ts)
        np.testing.assert_allclose(got[0], ddpm.AYS_SIGMAS_SD[0], rtol=0.02)
        np.testing.assert_allclose(got[-1], ddpm.AYS_SIGMAS_SD[-1], rtol=0.05)


def test_ays_sdxl_table_differs():
    schedule = ddpm.make_schedule()
    a = ddpm.ays_timesteps(schedule, 10, table=ddpm.AYS_SIGMAS_SD)
    b = ddpm.ays_timesteps(schedule, 10, table=ddpm.AYS_SIGMAS_SDXL)
    assert (a != b).any()


# ------------------------------------------------------------------- beta
def test_beta_grid_clusters_both_ends():
    schedule = ddpm.make_schedule()
    n = 20
    ts = ddpm.beta_timesteps(schedule, n)
    assert ts.shape == (n,) and (np.diff(ts) < 0).all()
    assert ts[0] == 999 and ts[-1] == 0  # ppf(1)=1 -> s_max, ppf(0)=0 -> s_min
    # Beta(0.6, 0.6) quantiles cluster at BOTH ends: end sigma-gaps smaller
    # than the middle gap (in linear sigma, the distribution's space)
    sig = _sig(schedule, ts)
    gaps = -np.diff(sig)
    assert gaps[0] < gaps[n // 2 - 1] and gaps[-1] < gaps[n // 2 - 1]


def test_beta_matches_scipy_ppf():
    from scipy.stats import beta as beta_dist
    schedule = ddpm.make_schedule()
    n = 12
    ts = ddpm.beta_timesteps(schedule, n, alpha=0.6, beta=0.6)
    sig_all = np.sqrt((1 - np.asarray(schedule.alphas_cumprod, np.float64))
                      / np.asarray(schedule.alphas_cumprod, np.float64))
    q = beta_dist.ppf(1 - np.linspace(0, 1, n), 0.6, 0.6)
    want = sig_all[0] + q * (sig_all[-1] - sig_all[0])
    got = _sig(schedule, ts)
    for g, w, t in zip(got[1:-1], want[1:-1], ts[1:-1]):
        gap = abs(np.log(sig_all[min(t + 1, 999)]) - np.log(sig_all[t - 1]))
        assert abs(np.log(g) - np.log(w)) <= gap


# --------------------------------------------------------------- pipeline
@pytest.mark.parametrize("spacing", ["sgm_uniform", "kl_optimal", "ays",
                                     "beta"])
def test_pipeline_new_spacings(tiny_models, tiny_tokenizer, tiny_cfg,
                               spacing):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              sampler_name="dpm++")
    img = sdt.generate("a cat", timestep_spacing=spacing, **kw)
    ref = sdt.generate("a cat", timestep_spacing="uniform", **kw)
    assert img.shape == (H, W, 3)
    assert (img != ref).any()


def test_pipeline_unknown_spacing_rejected(tiny_models, tiny_tokenizer,
                                           tiny_cfg):
    with pytest.raises(ValueError, match="timestep_spacing"):
        sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, n_inference_steps=N_STEPS, height=H,
                     width=W, timestep_spacing="not_a_real_spacing_name")
