"""Full-size parity against goldens recorded from the EXECUTED reference.

tests/goldens/reference_fullsize.npz was produced by
tests/record_reference_goldens.py: our synthetic full-size SD-1.5 weights
(deterministic, tests/fullsize_utils.py) were exported through
weights/convert.deconvert to a CompVis .ckpt, loaded by the REFERENCE's own
`model_loader.preload_models_from_standard_weights` (which runs its
1055-line converter and `load_state_dict(strict=True)` — so the recording
itself proves two-way converter coverage at full size), and the reference's
CLIP / Diffusion / VAE forwards were recorded on fixed inputs.

Here we regenerate the identical weights (threefry PRNG is deterministic and
platform-independent; fingerprints verify) and require PSNR > 55 dB between
our forwards (reference_quirks=True) and the reference's recorded outputs —
and that the corrected default mode genuinely differs where the reference's
bugs live (UNet GeGLU gate, VAE attention scramble).
"""

import os

import jax
import numpy as np
import pytest

import fullsize_utils
from conftest import psnr, to_nchw, to_nhwc

from pytorch_stable_diffusion_tpu.core.dtypes import FP32
from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod
from pytorch_stable_diffusion_tpu.models.config import sd15_config

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "goldens", "reference_fullsize.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="goldens not recorded (tests/record_reference_goldens.py)")

PSNR_BAR = 55.0


@pytest.fixture(scope="module")
def bits():
    g = dict(np.load(GOLDEN).items())
    cfg = sd15_config()
    params = fullsize_utils.init_fullsize_params(cfg)

    # prove we regenerated the exact weights the goldens were recorded with
    from pytorch_stable_diffusion_tpu.weights import convert

    fp = fullsize_utils.fingerprint(convert.deconvert(params, cfg))
    for k, v in fp.items():
        np.testing.assert_allclose(
            v, g[f"fp_{k}"], rtol=1e-6,
            err_msg=f"weight fingerprint drift at {k}: synthetic init is no "
                    "longer reproducible — re-record the goldens")
    return g, cfg, params


def test_time_embedding_matches_reference_helper(bits):
    g, _, _ = bits
    ours = np.asarray(unet_mod.timestep_embedding(
        int(g["in_timestep"]), 320))
    np.testing.assert_allclose(ours.reshape(1, -1), g["out_time_embedding"],
                               rtol=1e-5, atol=1e-6)


def test_clip_fullsize_vs_reference(bits):
    g, cfg, params = bits
    tokens = g["in_tokens"].astype(np.int32)
    ours = np.asarray(jax.jit(
        lambda p, t: clip_mod.apply(p, t, cfg.clip, FP32)
    )(params["clip"], tokens))
    score = psnr(ours, g["out_clip_out"])
    assert score > PSNR_BAR, f"CLIP PSNR {score:.1f} dB vs executed reference"


def test_unet_fullsize_vs_reference(bits):
    g, cfg, params = bits
    lat = to_nhwc(g["in_latent"])
    ctx = g["out_clip_out"][:1]  # reference conditioned on its own CLIP out
    t = int(g["in_timestep"])

    def run(quirks):
        return np.asarray(jax.jit(
            lambda p, l, c: unet_mod.apply(p, l, c, t, cfg.unet, FP32,
                                           reference_quirks=quirks)
        )(params["diffusion"], lat, ctx))

    ours = run(True)
    score = psnr(to_nchw(ours), g["out_diffusion_out"])
    assert score > PSNR_BAR, f"UNet PSNR {score:.1f} dB vs executed reference"
    # the corrected default (gated GeGLU) must genuinely diverge
    fixed = run(False)
    assert psnr(to_nchw(fixed), g["out_diffusion_out"]) < 30


def test_vae_encoder_fullsize_vs_reference(bits):
    g, cfg, params = bits
    img = to_nhwc(g["in_image"])
    noise = to_nhwc(g["in_enc_noise"])
    ours = np.asarray(jax.jit(
        lambda p, x, n: vae_mod.apply_encoder(p, x, n, cfg.vae, FP32,
                                              reference_quirks=True)
    )(params["encoder"], img, noise))
    score = psnr(to_nchw(ours), g["out_encoder_out"])
    assert score > PSNR_BAR, f"VAE-enc PSNR {score:.1f} dB vs executed reference"


def test_vae_decoder_fullsize_vs_reference(bits):
    g, cfg, params = bits
    lat = to_nhwc(g["in_latent"])

    def run(quirks):
        return np.asarray(jax.jit(
            lambda p, l: vae_mod.apply_decoder(p, l, cfg.vae, FP32,
                                               reference_quirks=quirks)
        )(params["decoder"], lat))

    ours = run(True)
    score = psnr(to_nchw(ours), g["out_decoder_out"])
    assert score > PSNR_BAR, f"VAE-dec PSNR {score:.1f} dB vs executed reference"
    # the corrected default (real un-transpose + applied GN) must genuinely
    # diverge (with random weights the downstream convs attenuate the
    # mid-block difference, so the gap is smaller than the UNet's)
    fixed = run(False)
    assert psnr(to_nchw(fixed), g["out_decoder_out"]) < 45
