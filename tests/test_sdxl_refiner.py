"""SDXL-refiner architecture (elective family tier; the reference covers
only SD-1.5).  Single bigG tower whose penultimate hidden IS the context,
pooled + text_projection + aesthetic-score add_time_ids (5, not base's 6),
4-level UNet with depth-4 transformer blocks at levels 1/2 + bottleneck.
"""

import dataclasses

import jax
import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models import vae as vae_mod
from pytorch_stable_diffusion_tpu.models.config import (
    CLIPConfig, SDConfig, UNetConfig, VAEConfig, sdxl_refiner_config)
from pytorch_stable_diffusion_tpu.weights import convert


def tiny_refiner_config(**kw) -> SDConfig:
    return SDConfig(
        clip=CLIPConfig(vocab_size=1024, d_model=32, max_len=16, n_layers=3,
                        n_heads=4, d_ff=64, hidden_act="gelu",
                        stop_at_layer=2, penultimate_norm=False,
                        text_projection=True, layout="open_clip",
                        key_prefix="conditioner.embedders.0.model"),
        vae=VAEConfig(base_channels=16, ch_mults=(1, 2), groups=4,
                      scale_factor=0.13025),
        unet=UNetConfig(model_channels=16, ch_mults=(1, 2),
                        attn_levels=(False, True), transformer_depth=(0, 2),
                        head_dim=8, d_context=32, groups=4,
                        add_embed_dim=32 + 5 * 4, add_time_ids=5),
        **kw,
    )


@pytest.fixture(scope="module")
def rf_cfg():
    return tiny_refiner_config()


@pytest.fixture(scope="module")
def rf_models(rf_cfg):
    key = jax.random.PRNGKey(13)
    return {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), rf_cfg.clip),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), rf_cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), rf_cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), rf_cfg.unet),
    }


def test_refiner_unet_param_count():
    """2,259,526,660 — computed from the sgm sd_xl_refiner.yaml topology
    (the commonly-quoted "2.3B" refiner UNet); regression-locked, no real
    weights on this host to verify against."""
    cfg = sdxl_refiner_config()
    shapes = jax.eval_shape(lambda k: unet_mod.init(k, cfg.unet),
                            jax.random.PRNGKey(0))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(shapes))
    assert n == 2_259_526_660, n


def test_refiner_converter_round_trip(rf_cfg):
    sd = convert.synthetic_state_dict(rf_cfg, seed=5)
    assert any(k.startswith("conditioner.embedders.0.model.") for k in sd)
    assert "conditioner.embedders.0.model.text_projection" in sd
    assert "model.diffusion_model.label_emb.0.0.weight" in sd
    models = convert.convert(sd, rf_cfg)
    assert "clip2" not in models and "add_embed" in models["diffusion"]
    sd2 = convert.deconvert(models, rf_cfg)
    assert set(sd) == set(sd2)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(sd[k]), np.asarray(sd2[k]))


def test_refiner_img2img_generate(rf_cfg, rf_models, tiny_tokenizer):
    """The refiner's intended mode: img2img refinement at moderate
    strength, single-tower context + 5-id added conditioning."""
    import pytorch_stable_diffusion_tpu as sdt

    rng = np.random.RandomState(1)
    init = rng.randint(0, 255, (16, 16, 3), np.uint8)
    kw = dict(models=rf_models, tokenizer=tiny_tokenizer, seed=8,
              n_inference_steps=3, config=rf_cfg, height=16, width=16,
              sampler_name="euler")
    img = sdt.generate("a cat", "", input_image=init, strength=0.5, **kw)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(
        img, sdt.generate("a cat", "", input_image=init, strength=0.5, **kw))
    # txt2img works too, and the aesthetic score is live conditioning
    a = sdt.generate("a cat", "", **kw)
    b = sdt.generate("a cat", "",
                     **{**kw, "config": dataclasses.replace(
                         rf_cfg, aesthetic_score=2.5)})
    assert a.shape == (16, 16, 3)
    assert not np.array_equal(a, b), "aesthetic_score must condition output"


def test_refiner_micro_conditioning(rf_cfg, rf_models):
    """original_size/crop change the refiner's 4-id prefix; target_size is
    rejected (the 5-id layout ends in the aesthetic score, not a target)."""
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.weights.tokenizer import \
        make_test_tokenizer

    tok = make_test_tokenizer(["a", "cat"], max_len=rf_cfg.clip.max_len)
    init = np.zeros((16, 16, 3), np.uint8)
    kw = dict(models=rf_models, tokenizer=tok, config=rf_cfg,
              n_inference_steps=2, height=16, width=16, seed=0,
              input_image=init, strength=0.8)
    base = sdt.generate("a cat", **kw)
    micro = sdt.generate("a cat", original_size=(64, 64),
                         crop_coords=(2, 2), **kw)
    assert (micro != base).any()
    with pytest.raises(ValueError, match="target_size"):
        sdt.generate("a cat", target_size=(64, 64), **kw)
