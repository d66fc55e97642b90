"""Inpainting: latent-blend masking (any 4-channel checkpoint) and the
dedicated 9-channel inpaint UNet family (runwayml-style conditioning).

The reference has no inpainting; semantics here follow the de-facto SD
standard: mask 1 = repaint, 0 = keep; 9-channel per-step input
[latents, nearest-mask, masked-image latents]; blend mode re-noises the
original latents each step and projects them into the kept region with an
exact final blend (pipeline.py inpaint="unet9"/"blend").
"""

import dataclasses

import jax
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu import pipeline as pipeline_mod
from pytorch_stable_diffusion_tpu.models import unet, vae
from pytorch_stable_diffusion_tpu.models.config import (
    sd15_inpaint_config, sd2_inpaint_config)
from pytorch_stable_diffusion_tpu.weights import convert

N_STEPS = 3
H = W = 16  # latent 8x8 with the tiny VAE (factor 2)


@pytest.fixture(scope="module")
def inpaint_cfg(tiny_cfg):
    return dataclasses.replace(
        tiny_cfg, unet=dataclasses.replace(tiny_cfg.unet, in_channels=9))


@pytest.fixture(scope="module")
def inpaint_models(tiny_cfg, tiny_models, inpaint_cfg):
    m = dict(tiny_models)
    m["diffusion"] = unet.init(jax.random.PRNGKey(9), inpaint_cfg.unet)
    return m


@pytest.fixture(scope="module")
def noises():
    rng = np.random.RandomState(7)
    return {
        "latent_init": rng.randn(1, 8, 8, 4).astype(np.float32),
        "sampler_noise": rng.randn(N_STEPS, 1, 8, 8, 4).astype(np.float32),
        "encoder_noise": rng.randn(1, 8, 8, 4).astype(np.float32),
        "mask_encoder_noise": rng.randn(1, 8, 8, 4).astype(np.float32),
    }


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, (H, W, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def half_mask():
    """Left half keep (0), right half repaint (1)."""
    m = np.zeros((H, W), np.float32)
    m[:, W // 2:] = 1.0
    return m


# ------------------------------------------------------------ mask helpers
def test_mask_downsample_nearest():
    m = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = pipeline_mod.mask_to_latent_nearest(m, 2)
    assert out.shape == (1, 2, 2, 1)
    # picks the top-left of each 2x2 cell
    np.testing.assert_array_equal(out[0, :, :, 0], [[0, 2], [8, 10]])


def test_mask_downsample_area():
    m = np.zeros((1, 4, 4, 1), np.float32)
    m[0, :, 2:, 0] = 1.0
    out = pipeline_mod.mask_to_latent_area(m, 2)
    assert out.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]),
                               [[0.0, 1.0], [0.0, 1.0]])


def test_prepare_mask_uint8_and_float():
    m = pipeline_mod._prepare_mask(np.full((H, W), 255.0, np.float32), W, H)
    assert m.shape == (1, H, W, 1) and m.max() == 1.0
    m = pipeline_mod._prepare_mask(np.full((H, W, 3), 0.5, np.float32), W, H)
    assert m.max() == 0.5
    with pytest.raises(ValueError):
        pipeline_mod._prepare_mask(np.zeros((4, 4), np.float32), W, H)


# ------------------------------------------------------------- blend mode
def test_blend_keeps_unmasked_region(tiny_cfg, tiny_models, tiny_tokenizer,
                                     noises, image, half_mask):
    img, lat = sdt.generate(
        "a photo of a cat", "", models=tiny_models, tokenizer=tiny_tokenizer,
        input_image=image, mask_image=half_mask, strength=1.0,
        n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W,
        fixed_noise=noises, return_latents=True)
    assert img.shape == (H, W, 3)

    # expected original latents: encode the prepared image with the same noise
    prepped = pipeline_mod._prepare_image(image, W, H)
    lat0 = np.asarray(vae.apply_encoder(
        tiny_models["encoder"], jax.numpy.asarray(prepped),
        jax.numpy.asarray(noises["encoder_noise"]), tiny_cfg.vae,
        tiny_cfg.policy))
    lat = np.asarray(lat)
    # kept (left) half is the original latents (final blend, m=0; tolerance
    # only for eager-vs-jit fp32 reduction order in the encoder)
    np.testing.assert_allclose(lat[:, :, :4, :], lat0[:, :, :4, :],
                               rtol=0, atol=1e-5)
    # repainted half genuinely changed
    assert np.abs(lat[:, :, 4:, :] - lat0[:, :, 4:, :]).max() > 1e-3


def test_blend_works_with_every_sampler_family(tiny_cfg, tiny_models,
                                               tiny_tokenizer, image,
                                               half_mask):
    for sampler in ("ddim", "dpm++", "heun"):
        img = sdt.generate(
            "a cat", "", models=tiny_models, tokenizer=tiny_tokenizer,
            input_image=image, mask_image=half_mask, sampler_name=sampler,
            n_inference_steps=2, config=tiny_cfg, height=H, width=W, seed=0)
        assert img.shape == (H, W, 3)


def test_mask_without_image_raises(tiny_cfg, tiny_models, tiny_tokenizer,
                                   half_mask):
    with pytest.raises(ValueError, match="requires input_image"):
        sdt.generate("a cat", "", models=tiny_models,
                     tokenizer=tiny_tokenizer, mask_image=half_mask,
                     n_inference_steps=2, config=tiny_cfg, height=H, width=W)


# ------------------------------------------------------- 9-channel UNet mode
def test_unet9_init_shape(inpaint_cfg):
    p = unet.init(jax.random.PRNGKey(0), inpaint_cfg.unet)
    assert p["conv_in"]["kernel"].shape == (3, 3, 9, 16)


def test_unet9_txt2img_and_inpaint(inpaint_cfg, inpaint_models,
                                   tiny_tokenizer, image, half_mask):
    # txt2img with an inpaint checkpoint: all-ones mask, zero masked image
    img = sdt.generate("a cat", "", models=inpaint_models,
                       tokenizer=tiny_tokenizer, n_inference_steps=2,
                       config=inpaint_cfg, height=H, width=W, seed=0)
    assert img.shape == (H, W, 3)

    # real inpaint: image + mask (strength 1.0 = repaint from full noise)
    img1 = sdt.generate("a cat", "", models=inpaint_models,
                        tokenizer=tiny_tokenizer, input_image=image,
                        mask_image=half_mask, strength=1.0,
                        n_inference_steps=2, config=inpaint_cfg,
                        height=H, width=W, seed=0)
    img2 = sdt.generate("a cat", "", models=inpaint_models,
                        tokenizer=tiny_tokenizer, input_image=image,
                        mask_image=half_mask, strength=1.0,
                        n_inference_steps=2, config=inpaint_cfg,
                        height=H, width=W, seed=0)
    np.testing.assert_array_equal(img1, img2)  # deterministic

    # a different mask must change the conditioning, hence the output
    img3 = sdt.generate("a cat", "", models=inpaint_models,
                        tokenizer=tiny_tokenizer, input_image=image,
                        mask_image=1.0 - half_mask, strength=1.0,
                        n_inference_steps=2, config=inpaint_cfg,
                        height=H, width=W, seed=0)
    assert np.abs(img1.astype(np.int32) - img3.astype(np.int32)).max() > 0


def test_unet9_image_without_mask_raises(inpaint_cfg, inpaint_models,
                                         tiny_tokenizer, image):
    with pytest.raises(ValueError, match="mask_image is required"):
        sdt.generate("a cat", "", models=inpaint_models,
                     tokenizer=tiny_tokenizer, input_image=image,
                     n_inference_steps=2, config=inpaint_cfg,
                     height=H, width=W)


def test_unet9_converter_roundtrip(inpaint_cfg):
    sd = convert.synthetic_state_dict(inpaint_cfg, seed=1)
    assert sd["model.diffusion_model.input_blocks.0.0.weight"].shape[1] == 9
    params = convert.convert(sd, inpaint_cfg)
    back = convert.deconvert(params, inpaint_cfg)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(sd[k]),
                                   rtol=0, atol=0)


def test_inpaint_api_method(tiny_cfg, tiny_models, tiny_tokenizer, image,
                            half_mask):
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    img = sd.inpaint("a cat", image, half_mask, n_inference_steps=2,
                     height=H, width=W, seed=0)
    assert img.shape == (H, W, 3)


def test_inpaint_config_presets():
    c = sd15_inpaint_config()
    assert c.unet.in_channels == 9 and c.unet.d_context == 768
    c2 = sd2_inpaint_config()
    assert (c2.unet.in_channels == 9 and c2.unet.d_context == 1024
            and c2.prediction_type == "epsilon"
            and c2.clip.layout == "open_clip")


def test_sdxl_inpaint_config_preset():
    from pytorch_stable_diffusion_tpu.models.config import sdxl_inpaint_config

    c = sdxl_inpaint_config()
    assert c.unet.in_channels == 9 and c.clip2 is not None
    assert c.unet.add_embed_dim == 2816


def test_sdxl_unet9_inpaint_e2e(tiny_tokenizer, image, half_mask):
    """9-channel conditioning composes with SDXL's dual-tower/add_cond
    path: masked-image concat + pooled conditioning in one compiled step."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod

    base = tiny_sdxl_config()
    cfg = dataclasses.replace(
        base, unet=dataclasses.replace(base.unet, in_channels=9))
    key = jax.random.PRNGKey(17)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    img = sdt.generate("a cat", "a dog", models=models,
                       tokenizer=tiny_tokenizer, config=cfg,
                       n_inference_steps=N_STEPS, height=H, width=W, seed=0,
                       input_image=image, mask_image=half_mask, strength=1.0)
    assert img.shape == (H, W, 3) and np.isfinite(img.astype(np.float32)).all()
    # the mask conditions the result
    inv = 1.0 - half_mask
    img2 = sdt.generate("a cat", "a dog", models=models,
                        tokenizer=tiny_tokenizer, config=cfg,
                        n_inference_steps=N_STEPS, height=H, width=W, seed=0,
                        input_image=image, mask_image=inv, strength=1.0)
    assert np.abs(img.astype(np.int32) - img2.astype(np.int32)).max() > 0
