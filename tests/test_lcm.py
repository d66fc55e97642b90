"""LCM sampler — distillation-grid timesteps, boundary-condition step
formula goldens, pipeline integration (style of tests/test_euler.py)."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.sampling import ddpm, lcm

N_STEPS = 2
H = W = 16


def test_timestep_grid():
    # 4 steps on the standard 50/1000 grid: stride 12 from the top
    np.testing.assert_array_equal(lcm.inference_timesteps(4),
                                  [999, 759, 519, 279])
    # full grid: every teacher position, descending 999, 979, ..., 19
    full = lcm.inference_timesteps(50)
    np.testing.assert_array_equal(full, np.arange(999, 0, -20))
    # 8 steps: stride 6
    np.testing.assert_array_equal(lcm.inference_timesteps(8),
                                  np.arange(999, 0, -20)[::6][:8])
    with pytest.raises(ValueError, match="at most"):
        lcm.inference_timesteps(51)


def test_step_closed_form():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 4, 4).astype(np.float32)
    t, prev = 999, 759
    got = np.asarray(lcm.step(s, t, lat, eps, noise,
                              num_inference_steps=4, prev_t=prev))
    # oracle: published LCM boundary scalings + re-diffusion to prev
    x0 = (lat - np.sqrt(1 - acp[t]) * eps) / np.sqrt(acp[t])
    st = t * 10.0
    c_skip = 0.25 / (st * st + 0.25)
    c_out = st / np.sqrt(st * st + 0.25)
    f = c_skip * lat + c_out * x0
    expect = np.sqrt(acp[prev]) * f + np.sqrt(1 - acp[prev]) * noise
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)


def test_final_step_is_consistency_output_no_noise():
    s = ddpm.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 2, 2, 4).astype(np.float32)
    eps = rng.randn(1, 2, 2, 4).astype(np.float32)
    t = 279
    a = np.asarray(lcm.step(s, t, lat, eps, np.zeros_like(lat),
                            num_inference_steps=4, prev_t=-1))
    b = np.asarray(lcm.step(s, t, lat, eps, np.full_like(lat, 1e6),
                            num_inference_steps=4, prev_t=-1))
    np.testing.assert_array_equal(a, b)  # prev_t < 0: noise unused
    x0 = (lat - np.sqrt(1 - acp[t]) * eps) / np.sqrt(acp[t])
    st = t * 10.0
    f = 0.25 / (st * st + 0.25) * lat + st / np.sqrt(st * st + 0.25) * x0
    np.testing.assert_allclose(a, f, rtol=2e-4, atol=2e-5)


def test_boundary_scalings_limits():
    # c_skip -> 1, c_out -> 0 as t -> 0 (consistency boundary f(x,0)=x)
    import jax.numpy as jnp

    c_skip, c_out = lcm.boundary_scalings(jnp.int32(0))
    assert float(c_skip) == 1.0 and float(c_out) == 0.0
    c_skip, c_out = lcm.boundary_scalings(jnp.int32(999))
    assert float(c_skip) < 1e-6 and float(c_out) > 0.999


def test_karras_spacing_rejected(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError, match="lcm"):
        sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                     sampler_name="lcm", timestep_spacing="karras",
                     n_inference_steps=N_STEPS, config=tiny_cfg,
                     height=H, width=W, seed=0)


def test_pipeline_lcm(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    # LCM's production config: CFG off (guidance is distilled in)
    img = sdt.generate("a cat", do_cfg=False, sampler_name="lcm", **kw)
    assert img.shape == (H, W, 3)
    img2 = sdt.generate("a cat", do_cfg=False, sampler_name="lcm", **kw)
    assert (img == img2).all()
    img3 = sdt.generate("a cat", do_cfg=False, sampler_name="lcm",
                        **{**kw, "seed": 99})
    assert (img != img3).any()
    # CFG path compiles and differs (LCM-LoRA at low scales uses it)
    img_cfg = sdt.generate("a cat", cfg_scale=1.5, sampler_name="lcm", **kw)
    assert (img != img_cfg).any()
    # img2img strength path on the distillation grid
    init = np.zeros((H, W, 3), np.uint8)
    img_i2i = sdt.generate("a cat", input_image=init, strength=0.5,
                           do_cfg=False, sampler_name="lcm", **kw)
    assert img_i2i.shape == (H, W, 3)


# ------------------------------------------------- native-LCM (embedded w)
def test_guidance_scale_embedding_formula():
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod

    dim, w = 256, 7.5
    got = np.asarray(unet_mod.guidance_scale_embedding(w, dim))
    assert got.shape == (1, dim)
    # oracle: diffusers get_guidance_scale_embedding — w*1000, half-dim
    # frequency ladder over (half-1), [sin, cos] order
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / (half - 1))
    ang = (w * 1000.0) * freqs
    expect = np.concatenate([np.sin(ang), np.cos(ang)])[None]
    # f32 tolerance: the largest angle is w*1000 ~ 7.5e3, whose f32 ulp is
    # ~5e-4 — sin/cos of it can't be tighter than that in ANY f32
    # implementation (diffusers' torch f32 included)
    np.testing.assert_allclose(got, expect.astype(np.float32), atol=1e-3)
    # batched w
    got2 = np.asarray(unet_mod.guidance_scale_embedding(
        np.array([0.0, 7.5], np.float32), dim))
    assert got2.shape == (2, dim)
    np.testing.assert_allclose(got2[1], got[0], rtol=1e-6)


def _lcm_cfg():
    import dataclasses

    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg = tiny_sd_config()
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, time_cond_dim=32))


def test_native_lcm_pipeline_embedded_guidance(tiny_tokenizer):
    """time_cond_dim UNet: cfg_scale flows through the guidance embedding
    even with do_cfg=False — different scales give different images."""
    import jax

    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    cfg = _lcm_cfg()
    key = jax.random.PRNGKey(0)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    assert "cond_proj" in models["diffusion"]["time_embed"]
    assert models["diffusion"]["time_embed"]["cond_proj"]["kernel"].shape \
        == (32, cfg.unet.model_channels)
    assert "bias" not in models["diffusion"]["time_embed"]["cond_proj"]

    kw = dict(models=models, tokenizer=tiny_tokenizer, seed=4, do_cfg=False,
              sampler_name="lcm", n_inference_steps=N_STEPS, config=cfg,
              height=H, width=W)
    a = sdt.generate("a cat", cfg_scale=8.0, **kw)
    a2 = sdt.generate("a cat", cfg_scale=8.0, **kw)
    assert (a == a2).all()
    b = sdt.generate("a cat", cfg_scale=2.0, **kw)
    assert (a != b).any()  # embedded guidance actually reaches the UNet


def test_lcm_cond_proj_converter_roundtrip():
    """deconvert -> convert keeps cond_proj exactly; both the CompVis and
    the diffusers layouts name the parameter."""
    import jax

    from pytorch_stable_diffusion_tpu.core.pytree import flatten
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae
    from pytorch_stable_diffusion_tpu.weights import convert
    from pytorch_stable_diffusion_tpu.weights import diffusers as dif

    cfg = _lcm_cfg()
    key = jax.random.PRNGKey(1)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    sd = convert.deconvert(models, cfg)
    assert "model.diffusion_model.time_embed.cond_proj.weight" in sd
    got = convert.convert(sd, cfg)
    ours, theirs = flatten(models), flatten(got)
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_array_equal(np.asarray(ours[k]),
                                      np.asarray(theirs[k]), err_msg=k)
    # diffusers rules name the same parameter (src is rule[0])
    dnames = [r[0] for r in dif.unet_rules(cfg) if "cond_proj" in r[0]]
    assert dnames == ["time_embedding.cond_proj.weight"]


def test_lcm_sdxl_composition(tiny_tokenizer):
    """lcm-sdxl architecture: embedded guidance (t_cond) composes with the
    SDXL added conditioning (add_cond) in one UNet."""
    import dataclasses

    import jax

    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    base = tiny_sdxl_config()
    cfg = dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, time_cond_dim=32))
    key = jax.random.PRNGKey(2)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    kw = dict(models=models, tokenizer=tiny_tokenizer, seed=4, do_cfg=False,
              sampler_name="lcm", n_inference_steps=N_STEPS, config=cfg,
              height=H, width=W)
    a = sdt.generate("a cat", cfg_scale=8.0, **kw)
    assert a.shape == (H, W, 3)
    b = sdt.generate("a cat", cfg_scale=2.0, **kw)
    assert (a != b).any()


def test_lcm_presets():
    import pytorch_stable_diffusion_tpu as s

    c15 = s.sd15_lcm_config()
    assert c15.unet.time_cond_dim == 256
    assert c15.unet.model_channels == 320 and c15.clip2 is None
    cxl = s.sdxl_lcm_config()
    assert cxl.unet.time_cond_dim == 256
    assert cxl.clip2 is not None and cxl.unet.add_embed_dim == 2816
