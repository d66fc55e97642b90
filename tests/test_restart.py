"""Restart sampler (sampling/restart.py; Xu et al. 2023, A1111 "Restart").

Plan-level invariants plus a degenerate-case equivalence: below 20 steps
there are no restarts, so the op list IS plain Heun on the Karras grid and
the pipeline output must match the heun sampler there.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, restart

H = W = 16


def test_plan_structure_36_steps():
    schedule = ddpm.make_schedule()
    p = restart.build_plan(schedule, 36)
    # 36 steps -> r_steps 9, r_times 2, main grid 18 -> 18 + 18 ops
    assert p["n_ops"] == 36
    assert p["t_start"].shape == p["t_end"].shape == p["rvar"].shape
    # exactly r_times big noise climbs (segment entries)
    sig = restart._sigma_all(schedule)
    big = p["rvar"] > 0.5
    assert big.sum() == 2
    # climbs land near the restart ceiling sigma
    for i in np.nonzero(big)[0]:
        assert abs(sig[p["t_start"][i]] - restart.SIGMA_MAX_RESTART) < 0.5
        # and climb FROM near the restart floor
        assert sig[p["t_prev"][i]] < 0.2
    # within every op, integration goes downward in sigma
    te = np.where(p["t_end"] >= 0, p["t_end"], 0)
    assert (sig[te] <= sig[p["t_start"]] + 1e-9).all()
    # img2img maps are valid op indices, monotone
    assert (np.diff(p["op_start"]) >= 0).all()
    assert p["op_start"][0] == 0 and p["op_start"][-1] < p["n_ops"]


def test_plan_no_restarts_below_20():
    schedule = ddpm.make_schedule()
    p = restart.build_plan(schedule, 10)
    assert p["n_ops"] == 10
    assert (p["rvar"] == 0.0).all()
    np.testing.assert_array_equal(p["t_start"],
                                  ddpm.karras_timesteps(schedule, 10))


def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, height=H, width=W, seed=0,
                        return_latents=True, **kw)


def test_restart_degenerates_to_heun_karras(tiny_models, tiny_tokenizer,
                                            tiny_cfg):
    _, lat_r = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    sampler_name="restart", n_inference_steps=6)
    _, lat_h = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    sampler_name="heun", timestep_spacing="karras",
                    n_inference_steps=6)
    np.testing.assert_allclose(np.asarray(lat_r), np.asarray(lat_h),
                               atol=1e-4, rtol=0)


def test_restart_with_restarts_runs_and_differs(tiny_models, tiny_tokenizer,
                                                tiny_cfg):
    img_r, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    sampler_name="restart", n_inference_steps=20)
    img_h, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    sampler_name="heun", timestep_spacing="karras",
                    n_inference_steps=20)
    assert img_r.shape == (H, W, 3)
    assert (img_r != img_h).any()


def test_restart_img2img(tiny_models, tiny_tokenizer, tiny_cfg):
    init = np.zeros((H, W, 3), np.uint8)
    img, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                  sampler_name="restart", n_inference_steps=20,
                  input_image=init, strength=0.6)
    assert img.shape == (H, W, 3)


def test_restart_validations(tiny_models, tiny_tokenizer, tiny_cfg):
    init = np.zeros((H, W, 3), np.uint8)
    mask = np.ones((H, W), np.float32)
    with pytest.raises(ValueError, match="inpaint"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, sampler_name="restart",
             n_inference_steps=6, input_image=init, mask_image=mask)
    with pytest.raises(ValueError, match="deepcache"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, sampler_name="restart",
             n_inference_steps=6, deepcache=2)
