"""InstructPix2Pix family (Brooks et al. 2023): 8-channel UNet, dual
text/image guidance over three lanes.

The reference supports only the 4-channel SD-1.5 UNet; this family is a
TPU-native extension matching the diffusers instruct_pix2pix pipeline
semantics.  The dual-CFG wiring is pinned BEHAVIORALLY — sharper than an
oracle: with s_text=0 the output is bitwise independent of the prompt,
with s_text=s_img... the formula collapses so the uncond prompt is
irrelevant, zeroing the conv_in's image channels makes the edit image
irrelevant (proving the [latents, image] channel order), and the whole
combination is affine in both scales.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models.config import (sd15_ip2p_config,
                                                        tiny_sd_config)

N_STEPS = 2
H = W = 16


@pytest.fixture(scope="module")
def ip2p_cfg():
    base = tiny_sd_config()
    return dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, in_channels=8))


@pytest.fixture(scope="module")
def ip2p_models(ip2p_cfg, tiny_models):
    # towers/VAE shared with the tiny fixtures; only the UNet differs
    return dict(tiny_models, diffusion=unet_mod.init(
        jax.random.PRNGKey(9), ip2p_cfg.unet))


@pytest.fixture(scope="module")
def edit_image():
    rng = np.random.RandomState(21)
    return rng.randint(0, 256, (H, W, 3)).astype(np.float32)


def _gen(models, tok, cfg, prompt="a photo of a cat", uncond="", **kw):
    kw.setdefault("n_inference_steps", N_STEPS)
    kw.setdefault("height", H)
    kw.setdefault("width", W)
    kw.setdefault("seed", 0)
    kw.setdefault("cfg_scale", 4.0)
    return sdt.generate(prompt, uncond, models=models, tokenizer=tok,
                        config=cfg, return_latents=True, **kw)


def test_config_preset():
    cfg = sd15_ip2p_config()
    assert cfg.unet.in_channels == 8
    assert cfg.unet.out_channels == 4
    # everything else is SD-1.5
    assert cfg.unet.level_channels == (320, 640, 1280, 1280)
    assert cfg.clip.d_model == 768


def test_requires_8_channel_unet(tiny_cfg, tiny_models, tiny_tokenizer,
                                 edit_image):
    with pytest.raises(ValueError, match="8-channel"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, edit_image=edit_image)


def test_rejects_compositions(ip2p_cfg, ip2p_models, tiny_tokenizer,
                              edit_image):
    with pytest.raises(ValueError, match="do_cfg"):
        _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, edit_image=edit_image,
             do_cfg=False)
    with pytest.raises(ValueError, match="replaces input_image"):
        _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, edit_image=edit_image,
             input_image=edit_image)
    with pytest.raises(ValueError, match="does not compose"):
        _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, edit_image=edit_image,
             sag_scale=0.5)
    with pytest.raises(ValueError, match="does not compose"):
        _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, edit_image=edit_image,
             guidance_rescale=0.5)


def test_e2e_shape_and_determinism(ip2p_cfg, ip2p_models, tiny_tokenizer,
                                   edit_image):
    img, lat = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                    edit_image=edit_image)
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    img2, _ = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                   edit_image=edit_image)
    np.testing.assert_array_equal(img, img2)
    img3, _ = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                   edit_image=edit_image, seed=1)
    assert (img != img3).any()


def test_stext_zero_drops_the_prompt(ip2p_cfg, ip2p_models, tiny_tokenizer,
                                     edit_image):
    """cfg_scale=0: eps = e_u + s_I (e_i − e_u) — both lanes use the
    UNCOND context, so the edit instruction must be bitwise irrelevant."""
    _, a = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, prompt="a cat",
                edit_image=edit_image, cfg_scale=0.0)
    _, b = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, prompt="a dog photo",
                edit_image=edit_image, cfg_scale=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...but the edit image still matters through s_img
    _, c = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, prompt="a cat",
                edit_image=255.0 - edit_image, cfg_scale=0.0)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_unity_scales_drop_the_uncond_lane(ip2p_cfg, ip2p_models,
                                           tiny_tokenizer, edit_image):
    """cfg=1, s_img=1: eps = e_u + (e_t − e_i) + (e_i − e_u) = e_t — the
    unconditional lane cancels exactly, so the NEGATIVE prompt is
    irrelevant (up to the float noise of the cancellation, which is exact
    here because the lanes are combined in f32 before any rounding)."""
    _, a = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, uncond="",
                edit_image=edit_image, cfg_scale=1.0,
                image_guidance_scale=1.0)
    _, b = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, uncond="a dog",
                edit_image=edit_image, cfg_scale=1.0,
                image_guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_affine_in_both_scales(ip2p_cfg, ip2p_models, tiny_tokenizer,
                               edit_image):
    """One DDPM step is affine in eps, and eps is affine in (s_T, s_I):
    lat(s_T=3) − lat(s_T=1) == 2 · (lat(s_T=2) − lat(s_T=1)), same in
    s_I."""
    def lat(st, si):
        _, l = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                    n_inference_steps=1, edit_image=edit_image,
                    cfg_scale=st, image_guidance_scale=si)
        return np.asarray(l, np.float64)

    np.testing.assert_allclose(lat(3, 1.5) - lat(1, 1.5),
                               2.0 * (lat(2, 1.5) - lat(1, 1.5)),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(lat(2, 3.0) - lat(2, 1.0),
                               2.0 * (lat(2, 2.0) - lat(2, 1.0)),
                               rtol=2e-4, atol=2e-5)


def test_image_rides_channels_4_to_8(ip2p_cfg, ip2p_models, tiny_tokenizer,
                                     edit_image):
    """Zeroing conv_in's kernel over input channels 4:8 makes the edit
    image bitwise irrelevant — proving the [latents, image] concat order
    (the diffusers channel contract) and that the image enters ONLY
    through those channels."""
    diff = dict(ip2p_models["diffusion"])
    ci = dict(diff["conv_in"])
    k = np.array(ci["kernel"])  # HWIO: (3, 3, 8, C)
    k[:, :, 4:, :] = 0.0
    ci["kernel"] = jnp.asarray(k)
    diff["conv_in"] = ci
    models = dict(ip2p_models, diffusion=diff)
    _, a = _gen(models, tiny_tokenizer, ip2p_cfg, edit_image=edit_image)
    _, b = _gen(models, tiny_tokenizer, ip2p_cfg,
                edit_image=255.0 - edit_image)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_composes_with_deepcache_and_samplers(ip2p_cfg, ip2p_models,
                                              tiny_tokenizer, edit_image):
    img, _ = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                  edit_image=edit_image, n_inference_steps=3, deepcache=2)
    assert img.shape == (H, W, 3)
    img2, _ = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg,
                   edit_image=edit_image, sampler_name="euler_a")
    assert img2.shape == (H, W, 3)


def test_api_edit(ip2p_cfg, ip2p_models, tiny_tokenizer, edit_image):
    sd = sdt.StableDiffusion(models=ip2p_models, tokenizer=tiny_tokenizer,
                             config=ip2p_cfg)
    img = sd.edit("make it a watercolor", edit_image,
                  image_guidance_scale=1.2, seed=1,
                  n_inference_steps=N_STEPS, height=H, width=W)
    assert img.shape == (H, W, 3)


def test_aot_export_roundtrip(ip2p_cfg, ip2p_models, tiny_tokenizer,
                              edit_image):
    from pytorch_stable_diffusion_tpu.utils import aot

    blob = aot.export_pipeline(ip2p_cfg, ip2p_models, n_steps=N_STEPS,
                               height=H, width=W, ip2p=True)
    loaded = aot.load_pipeline(blob)
    assert "image_cfg_scale" in loaded.aux_keys

    live, _ = _gen(ip2p_models, tiny_tokenizer, ip2p_cfg, prompt="a cat",
                   edit_image=edit_image, seed=5, cfg_scale=7.5,
                   image_guidance_scale=1.8)
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    from pytorch_stable_diffusion_tpu.pipeline import _prepare_image

    img_in = _prepare_image(edit_image, W, H)  # (1, H, W, 3) in [-1, 1]
    images, _ = loaded(ip2p_models, toks, un, jax.random.PRNGKey(5), 7.5,
                       input_image=img_in, image_cfg_scale=1.8)
    np.testing.assert_array_equal(images[0], live)
