"""SDXL architecture support (round 3) — dual text towers, per-level
transformer depth, added conditioning, 0.13025 VAE scale.

The reference covers only SD-1.5 (SURVEY §2); this is the elective family
tier, validated the same way SD-2.x was accepted in round 2: exact
synthetic checkpoint round-trip through the conditioner.embedders.{0,1} /
label_emb namespaces, structural param-count identity with the published
model, and an end-to-end generate at a scaled topology.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod
from pytorch_stable_diffusion_tpu.models.config import (
    CLIPConfig, SDConfig, UNetConfig, VAEConfig, sdxl_config,
    tiny_sdxl_config)
from pytorch_stable_diffusion_tpu.weights import convert


@pytest.fixture(scope="module")
def xl_cfg():
    return tiny_sdxl_config()


@pytest.fixture(scope="module")
def xl_models(xl_cfg):
    key = jax.random.PRNGKey(7)
    return {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), xl_cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), xl_cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), xl_cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), xl_cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), xl_cfg.unet),
    }


def test_sdxl_unet_param_count_matches_published():
    """Structural identity with SDXL-base: the real config's UNet must have
    exactly 2,567,463,684 params (the analog of SD-1.5's 859,520,964)."""
    cfg = sdxl_config()
    shapes = jax.eval_shape(lambda k: unet_mod.init(k, cfg.unet),
                            jax.random.PRNGKey(0))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(shapes))
    assert n == 2_567_463_684, n


def test_sdxl_converter_round_trip(xl_cfg):
    sd = convert.synthetic_state_dict(xl_cfg, seed=3)
    assert any(k.startswith("conditioner.embedders.1.model.") for k in sd)
    assert "model.diffusion_model.label_emb.0.0.weight" in sd
    assert "conditioner.embedders.1.model.text_projection" in sd
    models = convert.convert(sd, xl_cfg)
    assert "clip2" in models and "add_embed" in models["diffusion"]
    sd2 = convert.deconvert(models, xl_cfg)
    assert set(sd) == set(sd2)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), np.asarray(sd2[k]))


def test_pooled_text_contract(xl_cfg, xl_models):
    """hidden follows the un-normed-penultimate contract; pooled comes from
    the FULL stack + final norm + EOT token + text_projection."""
    toks = jnp.asarray([[1023, 5, 6, 1022] + [1022] * 12], jnp.int32)
    hidden, pooled = jax.jit(lambda p, t: clip_mod.apply_with_pooled(
        p, t, xl_cfg.clip2))(xl_models["clip2"], toks)
    assert hidden.shape == (1, 16, 32) and pooled.shape == (1, 32)
    # penultimate un-normed hidden must differ from the normed full output
    full_cfg = dataclasses.replace(xl_cfg.clip2, stop_at_layer=None)
    full = clip_mod.apply(xl_models["clip2"], toks, full_cfg)
    assert not np.allclose(np.asarray(hidden), np.asarray(full))


def test_sdxl_end_to_end_generate(xl_cfg, xl_models, tiny_tokenizer):
    import pytorch_stable_diffusion_tpu as sdt

    img = sdt.generate("a cat", "", models=xl_models,
                       tokenizer=tiny_tokenizer, seed=5,
                       n_inference_steps=2, config=xl_cfg,
                       height=16, width=16, sampler_name="euler")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # deterministic + seed-sensitive
    img_b = sdt.generate("a cat", "", models=xl_models,
                         tokenizer=tiny_tokenizer, seed=5,
                         n_inference_steps=2, config=xl_cfg,
                         height=16, width=16, sampler_name="euler")
    np.testing.assert_array_equal(img, img_b)
    img_c = sdt.generate("a cat", "", models=xl_models,
                         tokenizer=tiny_tokenizer, seed=6,
                         n_inference_steps=2, config=xl_cfg,
                         height=16, width=16, sampler_name="euler")
    assert (img != img_c).any()


def test_sdxl_img2img(xl_cfg, xl_models, tiny_tokenizer):
    """img2img glue (encode -> strength start-step -> denoise) composes with
    the SDXL conditioning path."""
    import pytorch_stable_diffusion_tpu as sdt

    rng = np.random.RandomState(0)
    init = rng.randint(0, 255, (16, 16, 3), np.uint8)
    img = sdt.generate("a cat", "", input_image=init, strength=0.6,
                       models=xl_models, tokenizer=tiny_tokenizer, seed=4,
                       n_inference_steps=3, config=xl_cfg,
                       height=16, width=16, sampler_name="euler")
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # strength must matter: weaker strength stays closer to the input
    img_hi = sdt.generate("a cat", "", input_image=init, strength=1.0,
                          models=xl_models, tokenizer=tiny_tokenizer, seed=4,
                          n_inference_steps=3, config=xl_cfg,
                          height=16, width=16, sampler_name="euler")
    assert not np.array_equal(img, img_hi)


def test_sdxl_micro_conditioning(xl_cfg, xl_models):
    """diffusers original_size/crops_coords_top_left/target_size knobs
    change the added conditioning (and therefore the image); SD-1.x
    rejects them."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config
    from pytorch_stable_diffusion_tpu.weights.tokenizer import \
        make_test_tokenizer

    tok = make_test_tokenizer(["a", "cat"], max_len=xl_cfg.clip.max_len)
    kw = dict(models=xl_models, tokenizer=tok, config=xl_cfg,
              n_inference_steps=2, height=16, width=16, seed=0)
    base = sdt.generate("a cat", **kw)
    micro = sdt.generate("a cat", original_size=(64, 64),
                         crop_coords=(4, 0), **kw)
    assert micro.shape == base.shape
    assert (micro != base).any()
    # defaults short-circuit: passing the implicit values changes nothing
    same = sdt.generate("a cat", original_size=(16, 16),
                        target_size=(16, 16), **kw)
    np.testing.assert_array_equal(same, base)

    sd15 = tiny_sd_config()
    with pytest.raises(ValueError, match="micro-conditioning"):
        sdt.generate("a cat", models=xl_models, tokenizer=tok, config=sd15,
                     n_inference_steps=2, height=16, width=16,
                     original_size=(64, 64))
