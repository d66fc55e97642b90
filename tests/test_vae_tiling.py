"""Tiled VAE decoding (models/vae.py apply_decoder_tiled).

Exactness contract: conv halos equal to the tail's receptive field make
every tile interior conv-exact; the ONLY approximation is GroupNorm spatial
statistics computed per window (the standard tiled-VAE approach, cf.
diffusers enable_vae_tiling).  Hence:
  * window >= image  ->  bit-near-exact output (degenerate case);
  * default halo     ->  high PSNR vs whole decode, no seams beyond the
                         GN-bias level (bars set from measured values with
                         margin; random weights are the worst case — real
                         SD weights have spatially stabler statistics).
"""

import jax
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from conftest import psnr

from pytorch_stable_diffusion_tpu.models import vae
from pytorch_stable_diffusion_tpu.models.config import sd15_config


@pytest.fixture(scope="module")
def dec_bits(tiny_cfg, tiny_models):
    lat = np.random.RandomState(0).randn(2, 32, 32, 4).astype(np.float32)
    whole = np.asarray(jax.jit(
        lambda p, l: vae.apply_decoder(p, l, tiny_cfg.vae)
    )(tiny_models["decoder"], lat))
    return tiny_models["decoder"], lat, whole


def _tiled(params, lat, cfg, **kw):
    return np.asarray(jax.jit(
        lambda p, l: vae.apply_decoder_tiled(p, l, cfg.vae, **kw)
    )(params, lat))


def test_degenerate_window_is_exact(dec_bits, tiny_cfg):
    """tile + 2*halo >= image: every window sees the whole image -> exact."""
    params, lat, whole = dec_bits
    tiled = _tiled(params, lat, tiny_cfg, tile=16)  # win = 16+2*10 > 32
    assert psnr(tiled, whole) > 100


def test_default_halo_quality(dec_bits, tiny_cfg):
    """Conv-exact halo, per-tile GN stats: measured 52.7 dB on this config
    (random weights); bar at 45 dB with margin."""
    params, lat, whole = dec_bits
    tiled = _tiled(params, lat, tiny_cfg, tile=8)
    assert psnr(tiled, whole) > 45
    # seams bounded: worst absolute deviation far below the image range
    assert np.abs(tiled - whole).max() < 0.1 * (whole.max() - whole.min())


def test_small_halo_degrades_gracefully(dec_bits, tiny_cfg):
    params, lat, whole = dec_bits
    tiled = _tiled(params, lat, tiny_cfg, tile=8, halo=2)
    assert psnr(tiled, whole) > 25  # visibly fine, measurably worse
    assert np.isfinite(tiled).all()


def test_non_divisible_tile_rejected(dec_bits, tiny_cfg):
    params, lat, _ = dec_bits
    with pytest.raises(ValueError, match="multiple"):
        vae.apply_decoder_tiled(params, lat, tiny_cfg.vae, tile=7)


def test_halo_formula():
    """SD-1.5 tail: 4 levels x 3 res x 2 convs + 3 upsample convs + out conv
    = 12.25 latent px -> 13."""
    assert vae.tail_receptive_halo(sd15_config().vae) == 13


def test_pipeline_decode_tile(tiny_cfg, tiny_models, tiny_tokenizer):
    """decode_tile threads through generate(); same latents, tiled decode."""
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=2, config=tiny_cfg, height=64, width=64)
    whole = sdt.generate("a cat", **kw)
    tiled = sdt.generate("a cat", decode_tile=8, **kw)
    assert tiled.shape == whole.shape
    # identical up to the GN-stat approximation and uint8 rounding (random
    # weights are the worst case: measured 89% of pixels within 1 level)
    diff = np.abs(tiled.astype(int) - whole.astype(int))
    assert np.mean(diff <= 1) > 0.8
    assert diff.max() <= 8


# ----------------------------------------------------------- tiled ENCODE
@pytest.fixture(scope="module")
def enc_bits(tiny_cfg, tiny_models):
    rs = np.random.RandomState(1)
    img = rs.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    noise = rs.randn(2, 32, 32, 4).astype(np.float32)
    whole = np.asarray(jax.jit(
        lambda p, im, nz: vae.apply_encoder(p, im, nz, tiny_cfg.vae)
    )(tiny_models["encoder"], img, noise))
    return tiny_models["encoder"], img, noise, whole


def _enc_tiled(params, img, noise, cfg, **kw):
    return np.asarray(jax.jit(
        lambda p, im, nz: vae.apply_encoder_tiled(p, im, nz, cfg.vae, **kw)
    )(params, img, noise))


def test_encode_degenerate_window_is_exact(enc_bits, tiny_cfg):
    """win = tile + 2*halo = 32 = whole latent grid -> every window sees
    the full image (tiny-cfg default halo is 7, so force 8)."""
    params, img, noise, whole = enc_bits
    tiled = _enc_tiled(params, img, noise, tiny_cfg, tile=16, halo=8)
    assert psnr(tiled, whole) > 100


def test_encode_default_halo_quality(enc_bits, tiny_cfg):
    params, img, noise, whole = enc_bits
    tiled = _enc_tiled(params, img, noise, tiny_cfg, tile=8)
    assert psnr(tiled, whole) > 45
    assert np.abs(tiled - whole).max() < 0.1 * (whole.max() - whole.min())


def test_encode_non_divisible_tile_rejected(enc_bits, tiny_cfg):
    params, img, noise, _ = enc_bits
    with pytest.raises(ValueError, match="multiple"):
        vae.apply_encoder_tiled(params, img, noise, tiny_cfg.vae, tile=7)


def test_encode_halo_formula():
    """SD-1.5 down path: 68 image px -> ceil(68/8) = 9 latent px."""
    assert vae.down_receptive_halo(sd15_config().vae) == 9


def test_pipeline_encode_tile(tiny_cfg, tiny_models, tiny_tokenizer):
    """encode_tile threads through img2img generate()."""
    init = (np.random.RandomState(3).uniform(0, 255, (64, 64, 3))
            .astype(np.uint8))
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=2, config=tiny_cfg, height=64, width=64,
              input_image=init, strength=0.8)
    whole = sdt.generate("a cat", **kw)
    tiled = sdt.generate("a cat", encode_tile=8, **kw)
    assert tiled.shape == whole.shape
    diff = np.abs(tiled.astype(int) - whole.astype(int))
    assert np.mean(diff <= 1) > 0.8
    assert diff.max() <= 8
