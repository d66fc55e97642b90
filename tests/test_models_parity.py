"""Model-level parity vs the torch oracle (reference semantics re-derived
from sd/clip.py, sd/encoder.py, sd/decoder.py, sd/diffusion.py; SURVEY §4.2).

Both sides consume the same CompVis-format state dict — the oracle directly,
our side through the converter — so these tests cover converter + model
wiring + op numerics end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from conftest import psnr, to_nchw, to_nhwc

from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod
from pytorch_stable_diffusion_tpu.weights import convert

TOL = dict(rtol=5e-4, atol=5e-5)


@pytest.fixture(scope="module")
def converted(tiny_cfg, tiny_state_dict):
    return convert.convert(tiny_state_dict, tiny_cfg)


@pytest.fixture(scope="module")
def torch_sd(tiny_state_dict):
    return {k: torch.as_tensor(np.asarray(v)) for k, v in tiny_state_dict.items()}


def test_clip_parity(tiny_cfg, converted, torch_sd):
    tokens = np.array([[1, 5, 9, 2] + [0] * 12, [3, 3, 3, 3] + [7] * 12], np.int32)
    ours = np.asarray(jax.jit(
        lambda p, t: clip_mod.apply(p, t, tiny_cfg.clip)
    )(converted["clip"], jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = oracle.clip_forward(torch_sd, torch.as_tensor(tokens.astype(np.int64)),
                                     tiny_cfg.clip).numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)
    assert psnr(ours, theirs) > 60


@pytest.mark.parametrize("quirks", [False, True])
def test_vae_encoder_parity(tiny_cfg, converted, torch_sd, quirks):
    rng = np.random.RandomState(0)
    img = rng.randn(1, 16, 16, 3).astype(np.float32)
    noise = rng.randn(1, 8, 8, 4).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda p, i, n: vae_mod.apply_encoder(p, i, n, tiny_cfg.vae,
                                              reference_quirks=quirks)
    )(converted["encoder"], jnp.asarray(img), jnp.asarray(noise)))
    with torch.no_grad():
        theirs = oracle.vae_encode(torch_sd, torch.as_tensor(to_nchw(img)),
                                   torch.as_tensor(to_nchw(noise)),
                                   tiny_cfg.vae, quirks).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), **TOL)


@pytest.mark.parametrize("quirks", [False, True])
def test_vae_decoder_parity(tiny_cfg, converted, torch_sd, quirks):
    lat = np.random.RandomState(1).randn(1, 8, 8, 4).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda p, l: vae_mod.apply_decoder(p, l, tiny_cfg.vae,
                                           reference_quirks=quirks)
    )(converted["decoder"], jnp.asarray(lat)))
    with torch.no_grad():
        theirs = oracle.vae_decode(torch_sd, torch.as_tensor(to_nchw(lat)),
                                   tiny_cfg.vae, quirks).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), **TOL)


def test_vae_quirk_changes_output(tiny_cfg, converted):
    lat = np.random.RandomState(1).randn(1, 8, 8, 4).astype(np.float32)
    a = np.asarray(vae_mod.apply_decoder(converted["decoder"], jnp.asarray(lat),
                                         tiny_cfg.vae, reference_quirks=False))
    b = np.asarray(vae_mod.apply_decoder(converted["decoder"], jnp.asarray(lat),
                                         tiny_cfg.vae, reference_quirks=True))
    assert not np.allclose(a, b)


@pytest.mark.parametrize("quirks", [False, True])
def test_unet_parity(tiny_cfg, converted, torch_sd, quirks):
    rng = np.random.RandomState(2)
    lat = rng.randn(2, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(2, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context).astype(np.float32)
    t = 981
    ours = np.asarray(jax.jit(
        lambda p, l, c: unet_mod.apply(p, l, c, t, tiny_cfg.unet,
                                       reference_quirks=quirks)
    )(converted["diffusion"], jnp.asarray(lat), jnp.asarray(ctx)))
    with torch.no_grad():
        theirs = oracle.unet_forward(torch_sd, torch.as_tensor(to_nchw(lat)),
                                     torch.as_tensor(ctx), t, tiny_cfg.unet,
                                     quirks).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-3, atol=2e-4)
    assert psnr(ours, to_nhwc(theirs)) > 60


def test_time_embedding_cos_first(tiny_cfg):
    """[cos, sin] ordering — cos first (ref pipeline.py:340-349)."""
    got = np.asarray(unet_mod.timestep_embedding(999, 320))
    expect = oracle.time_embedding(999, 320).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    # cos(0)=1 for the first half at t=0
    at0 = np.asarray(unet_mod.timestep_embedding(0, 320))
    np.testing.assert_allclose(at0[0, :160], 1.0, atol=1e-6)
    np.testing.assert_allclose(at0[0, 160:], 0.0, atol=1e-6)
