"""Mid-size parity: SD-1.5's exact topology (4 levels, 2 res/level, attention
on the first three levels, groups=32, 8 heads) at reduced widths, against the
torch oracle.  Catches dimension-dependent wiring bugs the tiny 2-level
config cannot (full 12-encoder/12-decoder skip discipline, 3 downsamples).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from conftest import psnr, to_nchw, to_nhwc

from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod
from pytorch_stable_diffusion_tpu.models.config import SDConfig, CLIPConfig, UNetConfig, VAEConfig
from pytorch_stable_diffusion_tpu.weights import convert


@pytest.fixture(scope="module")
def mid_cfg():
    return SDConfig(
        clip=CLIPConfig(vocab_size=256, d_model=64, max_len=8, n_layers=2,
                        n_heads=8, d_ff=128),
        vae=VAEConfig(base_channels=32, ch_mults=(1, 2, 4, 4), groups=32),
        unet=UNetConfig(model_channels=64, ch_mults=(1, 2, 4, 4),
                        attn_levels=(True, True, True, False),
                        num_res_blocks=2, n_heads=8, d_context=64, groups=32),
    )


@pytest.fixture(scope="module")
def mid_bits(mid_cfg):
    key = jax.random.PRNGKey(99)
    up = unet_mod.init(jax.random.fold_in(key, 0), mid_cfg.unet)
    dp = vae_mod.init_decoder(jax.random.fold_in(key, 1), mid_cfg.vae)
    from pytorch_stable_diffusion_tpu.models import clip as clip_mod

    cp = clip_mod.init(jax.random.fold_in(key, 2), mid_cfg.clip)
    ep = vae_mod.init_encoder(jax.random.fold_in(key, 3), mid_cfg.vae)
    params = {"clip": cp, "encoder": ep, "decoder": dp, "diffusion": up}
    sd = convert.deconvert(params, mid_cfg)
    torch_sd = {k: torch.as_tensor(np.asarray(v).copy()) for k, v in sd.items()}
    return params, torch_sd


def test_unet_midsize_parity(mid_cfg, mid_bits):
    params, torch_sd = mid_bits
    rng = np.random.RandomState(5)
    lat = rng.randn(1, 16, 16, 4).astype(np.float32)  # 3 downsamples -> 2x2
    ctx = rng.randn(1, mid_cfg.clip.max_len, mid_cfg.unet.d_context).astype(np.float32)
    t = 501
    ours = np.asarray(jax.jit(
        lambda p, l, c: unet_mod.apply(p, l, c, t, mid_cfg.unet)
    )(params["diffusion"], jnp.asarray(lat), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = oracle.unet_forward(torch_sd, torch.as_tensor(to_nchw(lat)),
                                     torch.as_tensor(ctx), t, mid_cfg.unet,
                                     quirks=False).numpy()
    assert psnr(ours, to_nhwc(theirs)) > 55, psnr(ours, to_nhwc(theirs))


def test_vae_midsize_parity(mid_cfg, mid_bits):
    params, torch_sd = mid_bits
    rng = np.random.RandomState(6)
    lat = rng.randn(1, 4, 4, 4).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda p, l: vae_mod.apply_decoder(p, l, mid_cfg.vae)
    )(params["decoder"], jnp.asarray(lat)))
    assert ours.shape == (1, 32, 32, 3)
    with torch.no_grad():
        theirs = oracle.vae_decode(torch_sd, torch.as_tensor(to_nchw(lat)),
                                   mid_cfg.vae, quirks=False).numpy()
    assert psnr(ours, to_nhwc(theirs)) > 55, psnr(ours, to_nhwc(theirs))
