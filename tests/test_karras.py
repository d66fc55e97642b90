"""Karras sigma-grid timestep spacing (sampling/ddpm.karras_timesteps +
pipeline timestep_spacing="karras").

The reference supports only the uniform grid; Karras spacing (denser steps
at low sigma) is the community-standard quality variant.  The refactor that
enables it — explicit ``prev_t`` threading — is bit-identical on the
uniform grid (covered by every existing golden/parity test) and is
validated here on the non-uniform grid via DPM-Solver++'s exactness
invariant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, dpm

H = W = 16
N_STEPS = 3


def test_karras_grid_properties():
    schedule = ddpm.make_schedule()
    ts = ddpm.karras_timesteps(schedule, 50)
    assert ts.shape == (50,)
    assert (np.diff(ts) < 0).all()  # strictly descending
    assert 0 <= ts.min() and ts.max() <= 999
    assert ts[0] == 999  # starts at sigma_max
    # denser at low sigma (low t): the last-quarter spacing is finer than
    # the first-quarter spacing
    gaps = -np.diff(ts)
    assert gaps[-12:].mean() < gaps[:12].mean()


def test_karras_respects_train_timesteps():
    schedule = ddpm.make_schedule()
    ts20 = ddpm.karras_timesteps(schedule, 20)
    assert (np.diff(ts20) < 0).all() and ts20[0] == 999


def test_dpm_constant_x0_invariant_on_karras_grid():
    """DPM-Solver++ maps alpha_t C + sigma_t d exactly to C at the end for
    a constant-x0 model — on ANY timestep grid.  Validates the prev_t
    threading on the non-uniform grid."""
    schedule = ddpm.make_schedule()
    n = 8
    ts = ddpm.karras_timesteps(schedule, n)
    prevs = np.append(ts[1:], -1).astype(np.int32)

    rng = np.random.RandomState(0)
    C = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)
    d = jnp.asarray(rng.randn(1, 4, 4, 4), jnp.float32)

    a0 = schedule.alphas_cumprod[ts[0]]
    x = jnp.sqrt(a0) * C + jnp.sqrt(1.0 - a0) * d
    state = dpm.init_state(x.shape)
    for t, p in zip(ts, prevs):
        a_t = schedule.alphas_cumprod[t]
        alpha, sigma = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
        eps = (x - alpha * C) / sigma  # model whose x0-prediction is C
        x, state = dpm.step(schedule, int(t), x, eps, state,
                            num_inference_steps=n, prev_t=int(p))
    np.testing.assert_allclose(np.asarray(x), np.asarray(C), atol=2e-4)


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm++", "euler_a",
                                     "heun", "unipc"])
def test_karras_spacing_end_to_end(tiny_cfg, tiny_models, tiny_tokenizer,
                                   sampler):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              sampler_name=sampler, return_latents=True)
    img_k, lat_k = sdt.generate("a cat", "a dog", timestep_spacing="karras",
                                **kw)
    assert img_k.shape == (H, W, 3) and np.isfinite(np.asarray(lat_k)).all()
    _, lat_u = sdt.generate("a cat", "a dog", **kw)
    assert np.abs(np.asarray(lat_k) - np.asarray(lat_u)).max() > 1e-6


def test_karras_img2img(tiny_cfg, tiny_models, tiny_tokenizer):
    init = np.random.RandomState(1).randint(0, 256, (H, W, 3)).astype(np.float32)
    img = sdt.generate("a cat", "", models=tiny_models,
                       tokenizer=tiny_tokenizer, config=tiny_cfg,
                       n_inference_steps=N_STEPS, height=H, width=W, seed=0,
                       input_image=init, strength=0.9,
                       timestep_spacing="karras")
    assert img.shape == (H, W, 3)


def test_unknown_spacing_raises(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError, match="timestep_spacing"):
        sdt.generate("a cat", "", models=tiny_models,
                     tokenizer=tiny_tokenizer, config=tiny_cfg,
                     n_inference_steps=N_STEPS, height=H, width=W,
                     timestep_spacing="bogus")


# -------------------------------------------- exponential (k-diffusion)
def test_exponential_grid_properties():
    schedule = ddpm.make_schedule()
    ts = ddpm.exponential_timesteps(schedule, 50)
    assert ts.shape == (50,)
    assert (np.diff(ts) < 0).all()
    assert ts[0] == 999 and ts[-1] == 0
    # log-sigma uniform: consecutive log-sigma gaps are near-constant
    abar = np.asarray(schedule.alphas_cumprod, np.float64)
    sig = np.sqrt((1 - abar) / abar)
    ls = np.log(sig[ts])
    gaps = -np.diff(ls)
    # interior gaps near-constant; the last few steps are bound by integer
    # timestep resolution (log-sigma per train step near t=0 is ~0.35,
    # coarser than the ideal grid wants), so exclude the tail
    interior = gaps[2:30]
    assert np.all(np.abs(interior - interior.mean()) < 0.15 * interior.mean())


def test_exponential_differs_from_karras_and_uniform():
    schedule = ddpm.make_schedule()
    e = ddpm.exponential_timesteps(schedule, 20)
    k = ddpm.karras_timesteps(schedule, 20)
    u = ddpm.inference_timesteps(20)
    assert not np.array_equal(e, k)
    assert not np.array_equal(e, u)


def test_pipeline_exponential_spacing(tiny_models, tiny_tokenizer, tiny_cfg):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              sampler_name="dpm++")
    img_e = sdt.generate("a cat", timestep_spacing="exponential", **kw)
    img_u = sdt.generate("a cat", **kw)
    assert img_e.shape == (H, W, 3)
    assert (img_e != img_u).any()
