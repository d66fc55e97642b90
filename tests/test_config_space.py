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
