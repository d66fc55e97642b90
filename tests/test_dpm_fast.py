"""DPM fast sampler (k-diffusion ``dpm_solver_fast``; A1111 "DPM fast").

Plan invariants (eval budget, remainder rule, coefficient algebra) and a
numpy oracle of the published per-segment updates driven by a synthetic
eps model, plus pipeline-level smoke/determinism.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, dpm_fast


@pytest.fixture(scope="module")
def schedule():
    return ddpm.make_schedule()


def test_eval_budget_and_remainder_rule(schedule):
    for n in (1, 2, 3, 4, 5, 6, 7, 20, 50):
        plan = dpm_fast.build_plan(schedule, n)
        m = plan["m"]
        assert m == n // 3 + 1
        # order of segment i is encoded by which coefficients are active
        orders = []
        for i in range(m):
            if plan["c2"][i] != 0.0 or plan["u2c0"][i] != 0.0:
                orders.append(3)
            elif plan["c1"][i] != 0.0:
                orders.append(2)
            else:
                orders.append(1)
        assert sum(orders) == n, (n, orders)
        if n % 3 == 0 and m >= 2:
            assert orders[-2:] == [2, 1]
        else:
            assert orders[-1] == n % 3 or n < 3


def test_boundaries_descend_and_entry_maps(schedule):
    plan = dpm_fast.build_plan(schedule, 20)
    t0 = plan["t0"]
    assert t0[0] == schedule.num_train_timesteps - 1  # sigma_max end
    assert np.all(np.diff(t0) < 0)  # t-space ascends = timesteps descend
    assert plan["t_exit"] == 0  # full range ends at the smallest sigma
    # strength mapping: start 0 enters the first segment, large starts
    # enter later segments, monotonically
    assert plan["seg_start"][0] == 0
    assert np.all(np.diff(plan["seg_start"]) >= 0)
    assert plan["start_t"][0] == t0[0]


def test_order1_coefficient_is_exact_sigma_difference(schedule):
    """e0c = sigma(t1') * expm1(h) telescopes to sigma(t0) - sigma(t1'):
    for a constant-eps model every order collapses to the exact ODE
    update X' = X + (sigma1 - sigma0) * eps."""
    plan = dpm_fast.build_plan(schedule, 7, eta=0.0)
    sig = np.asarray(ddpm.sigmas_all(schedule))
    t0 = plan["t0"]
    t1 = np.append(t0[1:], plan["t_exit"])
    np.testing.assert_allclose(plan["e0c"], sig[t0] - sig[t1], rtol=1e-5)
    assert np.all(plan["su"] == 0.0)  # eta 0: pure ODE


def _oracle_segment(sig, plan, i, x, eps_fn):
    """k-diffusion dpm_solver_{1,2,3}_step on the quantized grid, written
    independently in t-space (t = -log sigma) as the oracle."""
    t0 = int(plan["t0"][i])
    i1_ = None
    # reconstruct t1' from e0c: e0c = sig[t1'] * expm1(h) and
    # h = log(sig[t0]/sig[t1']) -> sig[t1'] = sig[t0] - e0c
    s_next = sig[t0] - plan["e0c"][i]
    i1_ = int(np.abs(sig - s_next).argmin())
    h = np.log(sig[t0] / sig[i1_])
    eps0 = eps_fn(x, t0)
    order = 3 if plan["u2c0"][i] != 0.0 else (2 if plan["c1"][i] != 0.0
                                              else 1)
    if order == 1:
        return x - sig[i1_] * np.expm1(h) * eps0
    r1 = 1.0 / 3.0 if order == 3 else 0.5
    s1 = int(plan["s1"][i])
    u1 = x - sig[s1] * np.expm1(r1 * h) * eps0
    eps1 = eps_fn(u1, s1)
    if order == 2:
        return x - sig[i1_] * np.expm1(h) * eps0 \
            - sig[i1_] / (2 * r1) * np.expm1(h) * (eps1 - eps0)
    r2 = 2.0 / 3.0
    s2 = int(plan["s2"][i])
    u2 = x - sig[s2] * np.expm1(r2 * h) * eps0 \
        - sig[s2] * (r2 / r1) * (np.expm1(r2 * h) / (r2 * h) - 1.0) \
        * (eps1 - eps0)
    eps2 = eps_fn(u2, s2)
    return x - sig[i1_] * np.expm1(h) * eps0 \
        - sig[i1_] / r2 * (np.expm1(h) / h - 1.0) * (eps2 - eps0)


def test_segment_updates_match_oracle(schedule):
    """Drive the plan's uniform 3-eval combine with a state-dependent
    synthetic eps model and compare against the order-dispatched oracle."""
    sig = np.asarray(ddpm.sigmas_all(schedule), np.float64)
    plan = dpm_fast.build_plan(schedule, 7, eta=0.0)  # orders [3,3,1]
    rs = np.random.RandomState(0)
    w = rs.randn(4).astype(np.float64) * 0.1

    def eps_fn(x, t):
        return np.tanh(w * x + 0.01 * t / 1000.0)

    x_plan = rs.randn(4)
    x_oracle = x_plan.copy()
    for i in range(plan["m"]):
        t0 = int(plan["t0"][i])
        eps0 = eps_fn(x_plan, t0)
        u1 = x_plan - plan["u1c"][i] * eps0
        eps1 = eps_fn(u1, int(plan["s1"][i]))
        u2 = x_plan - plan["u2c0"][i] * eps0 \
            - plan["u2c1"][i] * (eps1 - eps0)
        eps2 = eps_fn(u2, int(plan["s2"][i]))
        x_plan = x_plan - plan["e0c"][i] * eps0 \
            - plan["c1"][i] * (eps1 - eps0) \
            - plan["c2"][i] * (eps2 - eps0)
        x_oracle = _oracle_segment(sig, plan, i, x_oracle, eps_fn)
        np.testing.assert_allclose(x_plan, x_oracle, rtol=1e-5,
                                   atol=1e-7, err_msg=f"segment {i}")


def test_pipeline_dpm_fast(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=4,
              return_latents=True)
    img, lat = sdt.generate("a photo of a dog", sampler_name="dpm_fast",
                            seed=3, **kw)
    assert img.shape == (16, 16, 3) and np.isfinite(lat).all()
    img2, lat2 = sdt.generate("a photo of a dog", sampler_name="dpm_fast",
                              seed=3, **kw)
    np.testing.assert_array_equal(lat, lat2)  # deterministic
    _, lat_e = sdt.generate("a photo of a dog", sampler_name="euler",
                            seed=3, **kw)
    assert np.abs(lat - lat_e).max() > 1e-3  # its own trajectory


def test_pipeline_dpm_fast_img2img(tiny_cfg, tiny_models, tiny_tokenizer):
    init = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    img = sdt.generate("a photo of a dog", sampler_name="dpm_fast",
                       models=tiny_models, tokenizer=tiny_tokenizer,
                       config=tiny_cfg, height=16, width=16,
                       n_inference_steps=6, seed=5, input_image=init,
                       strength=0.6)
    assert img.shape == (16, 16, 3)


def test_pipeline_dpm_fast_rejects_inpaint(tiny_cfg, tiny_models,
                                           tiny_tokenizer):
    init = np.zeros((16, 16, 3), np.uint8)
    mask = np.ones((16, 16), np.float32)
    with pytest.raises(ValueError, match="dpm_fast"):
        sdt.generate("a dog", sampler_name="dpm_fast", models=tiny_models,
                     tokenizer=tiny_tokenizer, config=tiny_cfg, height=16,
                     width=16, n_inference_steps=4, input_image=init,
                     mask_image=mask)
