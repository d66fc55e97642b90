"""Architecture-config generality: the plan-driven models and rule-generated
converters must work for any SDConfig, not just the SD-1.5 and tiny shapes
(guards the 'rules, not tables' design of weights/convert.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.pytree import flatten, param_count
from pytorch_stable_diffusion_tpu.models import unet, vae
from pytorch_stable_diffusion_tpu.models.config import (CLIPConfig, SDConfig,
                                                        UNetConfig, VAEConfig)
from pytorch_stable_diffusion_tpu.weights import convert, diffusers

VARIANTS = [
    # three levels, single res block, attn only on the middle level
    SDConfig(
        clip=CLIPConfig(vocab_size=64, d_model=16, max_len=8, n_layers=1,
                        n_heads=2, d_ff=32),
        vae=VAEConfig(base_channels=8, ch_mults=(1, 2, 2), groups=4),
        unet=UNetConfig(model_channels=8, ch_mults=(1, 2, 2),
                        attn_levels=(False, True, False), num_res_blocks=1,
                        n_heads=2, d_context=16, groups=4),
    ),
    # deeper single-level stack
    SDConfig(
        clip=CLIPConfig(vocab_size=64, d_model=16, max_len=8, n_layers=1,
                        n_heads=2, d_ff=32),
        vae=VAEConfig(base_channels=8, ch_mults=(1,), groups=4),
        unet=UNetConfig(model_channels=8, ch_mults=(1,), attn_levels=(True,),
                        num_res_blocks=3, n_heads=2, d_context=16, groups=4),
    ),
]


@pytest.mark.parametrize("cfg", VARIANTS, ids=["3lvl-1res", "1lvl-3res"])
def test_plans_and_converters_generalize(cfg):
    key = jax.random.PRNGKey(0)
    params = {
        "clip": __import__("pytorch_stable_diffusion_tpu.models.clip",
                           fromlist=["init"]).init(key, cfg.clip),
        "encoder": vae.init_encoder(key, cfg.vae),
        "decoder": vae.init_decoder(key, cfg.vae),
        "diffusion": unet.init(key, cfg.unet),
    }
    assert param_count(params) > 0

    # CompVis round trip
    sd = convert.deconvert(params, cfg)
    back = convert.convert(sd, cfg)
    a, b = flatten(params), flatten(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    # diffusers round trip
    d_sds = diffusers.deconvert_diffusers(params, cfg)
    back2 = diffusers.convert_diffusers(*d_sds, cfg)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]),
                                      np.asarray(flatten(back2)[k]), err_msg=k)

    # forward shapes
    f = cfg.vae.downsample_factor
    hw = 8 * f
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, cfg.clip.max_len, cfg.unet.d_context))
    out = unet.apply(params["diffusion"], lat, ctx, 10, cfg.unet)
    assert out.shape == lat.shape
    img = vae.apply_decoder(params["decoder"], lat, cfg.vae)
    assert img.shape == (1, hw, hw, 3)
    enc = vae.apply_encoder(params["encoder"], img, jnp.zeros_like(lat), cfg.vae)
    assert enc.shape == lat.shape


def test_head_dim_mode():
    """SD-2.x style fixed head_dim -> per-level head counts."""
    cfg = UNetConfig(model_channels=8, ch_mults=(1, 2), attn_levels=(True, True),
                     num_res_blocks=1, head_dim=4, d_context=16, groups=4)
    assert cfg.heads_for(8) == 2 and cfg.heads_for(16) == 4
    with pytest.raises(ValueError, match="divisible"):
        cfg.heads_for(10)

    key = jax.random.PRNGKey(0)
    params = unet.init(key, cfg)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 8, 16))
    out = unet.apply(params, lat, ctx, 10, cfg)
    assert out.shape == lat.shape

    # head_dim equal to C/n_heads everywhere == fixed n_heads (same math)
    cfg_fixed = dataclasses.replace(cfg, head_dim=None, n_heads=2)
    out_fixed = unet.apply(params, lat, ctx, 10, cfg_fixed)
    # level-0 blocks match (2 heads there either way); level-1 differs (4 vs 2)
    assert out.shape == out_fixed.shape


def test_clip_variant_options():
    """SD-2.x CLIP options: gelu activation + penultimate-layer output."""
    import torch
    import torch.nn.functional as F

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.ops import norm as norm_ops

    base = CLIPConfig(vocab_size=32, d_model=8, max_len=4, n_layers=2,
                      n_heads=2, d_ff=16)
    key = jax.random.PRNGKey(1)
    params = clip_mod.init(key, base)
    toks = jnp.asarray(np.array([[1, 2, 3, 4]], np.int32))

    # gelu differs from quick_gelu and matches torch's exact gelu
    out_qg = np.asarray(clip_mod.apply(params, toks, base))
    cfg_gelu = dataclasses.replace(base, hidden_act="gelu")
    out_g = np.asarray(clip_mod.apply(params, toks, cfg_gelu))
    assert not np.allclose(out_qg, out_g)

    # stop_at_layer=1 on a 2-layer model == 1-layer model with same params
    cfg_stop = dataclasses.replace(base, stop_at_layer=1)
    out_stop = np.asarray(clip_mod.apply(params, toks, cfg_stop))
    one_layer = dict(params, layers=params["layers"][:1])
    cfg_one = dataclasses.replace(base, n_layers=1)
    out_one = np.asarray(clip_mod.apply(one_layer, toks, cfg_one))
    np.testing.assert_allclose(out_stop, out_one, rtol=1e-6, atol=1e-7)


def test_v_prediction_conversion():
    """v-pred -> epsilon: with eps = s x + a v both parameterizations must
    drive the sampler identically."""
    from pytorch_stable_diffusion_tpu.sampling import ddpm as ddpm_mod

    s = ddpm_mod.make_schedule()
    acp = np.asarray(s.alphas_cumprod, np.float64)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    eps = rng.randn(1, 4, 4, 4).astype(np.float32)
    t = 500
    a, sg = np.sqrt(acp[t]), np.sqrt(1 - acp[t])
    v = ((eps - sg * x) / a).astype(np.float32)  # the v that encodes this eps
    got = np.asarray(ddpm_mod.to_epsilon(s, t, x, v, "v"))
    np.testing.assert_allclose(got, eps, rtol=1e-4, atol=1e-5)
    # epsilon mode is a pass-through
    np.testing.assert_array_equal(
        np.asarray(ddpm_mod.to_epsilon(s, t, x, eps, "epsilon")), eps)
    with pytest.raises(ValueError, match="prediction_type"):
        ddpm_mod.to_epsilon(s, t, x, eps, "sample")


def test_v_prediction_pipeline(tmp_path):
    """v-pred tiny pipeline runs and differs from epsilon interpretation."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

    cfg = sdt.tiny_sd_config()
    cfg_v = dataclasses.replace(cfg, prediction_type="v")
    key = jax.random.PRNGKey(0)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    tok = make_test_tokenizer(["a", "cat"], max_len=cfg.clip.max_len)
    kw = dict(models=models, tokenizer=tok, seed=3, n_inference_steps=2,
              height=16, width=16)
    img_v = sdt.generate("a cat", config=cfg_v, **kw)
    img_e = sdt.generate("a cat", config=cfg, **kw)
    assert img_v.shape == (16, 16, 3)
    assert (img_v != img_e).any()


def test_sd21_preset_shapes():
    from pytorch_stable_diffusion_tpu.models.config import sd21_config

    cfg = sd21_config()
    assert cfg.unet.heads_for(320) == 5 and cfg.unet.heads_for(1280) == 20
    assert cfg.clip.stop_at_layer == 23 and cfg.clip.hidden_act == "gelu"
    assert cfg.prediction_type == "v"
    assert sd21_config(v_prediction=False).prediction_type == "epsilon"
