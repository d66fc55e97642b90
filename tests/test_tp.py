"""Tensor parallelism: sharded run must match the replicated run."""

import jax
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core import mesh as mesh_mod
from pytorch_stable_diffusion_tpu.parallel import tp

N_STEPS = 2
H = W = 16


def test_rules_cover_attention_and_ffn(tiny_models):
    rules = tp.unet_tp_rules(tiny_models["diffusion"])
    assert any(p.endswith("self_attn/q/kernel") for p in rules)
    assert any(p.endswith("cross_attn/out/kernel") for p in rules)
    assert any(p.endswith("geglu_proj/kernel") for p in rules)
    crules = tp.clip_tp_rules(tiny_models["clip"])
    assert any(p.endswith("fc1/kernel") for p in crules)


def test_shard_models_placement(tiny_models):
    mesh = mesh_mod.make_mesh(data=2, model=4)
    placed = tp.shard_models(tiny_models, mesh)
    qk = placed["diffusion"]["bottleneck"]["attn"]["self_attn"]["q"]["kernel"]
    # column-parallel: out-dim sharded 4 ways
    assert qk.sharding.spec == tp.COL
    norm = placed["diffusion"]["norm_out"]["scale"]
    assert norm.sharding.spec == tp.REPL


def test_tp_matches_replicated(tiny_cfg, tiny_models, tiny_tokenizer):
    """model=4 TP (+2-way DP) output == single-device output (uint8 ±1).

    tiny config has 4 heads -> divisible by model axis 4."""
    prompts = ["a cat", "a dog"]
    kw = dict(tokenizer=tiny_tokenizer, seed=3, n_inference_steps=N_STEPS,
              config=tiny_cfg, height=H, width=W)
    single = sdt.generate_images(prompts, models=tiny_models, **kw)

    mesh = mesh_mod.make_mesh(data=2, model=4)
    tp_imgs = tp.generate_images_tp(prompts, mesh=mesh, models=tiny_models, **kw)
    assert tp_imgs.shape == single.shape
    assert np.abs(tp_imgs.astype(int) - single.astype(int)).max() <= 1


def test_unfused_qkv_matches_fused(tiny_cfg, tiny_models, tiny_tokenizer):
    """fuse_qkv=False (the auto-selected TP form, ADVICE r2) is numerically
    the same program: fused concat-matmul-split == three separate linears
    up to fp summation order."""
    import dataclasses

    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=N_STEPS, height=H, width=W)
    fused = sdt.generate("a cat", "", config=tiny_cfg, **kw)
    unfused = sdt.generate(
        "a cat", "", config=dataclasses.replace(tiny_cfg, fuse_qkv=False),
        **kw)
    assert np.abs(fused.astype(int) - unfused.astype(int)).max() <= 1


def test_sdxl_tp_matches_replicated(tiny_tokenizer):
    """SDXL tree under TP: stacked-block attn paths and the clip2 tower get
    specs, and a model=2 (+2-way DP) run matches single-device (uint8 ±1)."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(21)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    rules = tp.unet_tp_rules(models["diffusion"])
    assert any("/blocks/1/" in p and p.endswith("self_attn/q/kernel")
               for p in rules), "stacked-depth blocks must be sharded"
    c2 = tp.clip_tp_rules(models["clip2"], "clip2")
    assert any(p.endswith("fc1/kernel") for p in c2)

    prompts = ["a cat", "a dog", "a fox", "a bird"]
    kw = dict(tokenizer=tiny_tokenizer, seed=9, n_inference_steps=N_STEPS,
              config=cfg, height=H, width=W, sampler_name="euler")
    single = sdt.generate_images(prompts, models=models, **kw)
    # model=2 divides every head count in the tiny SDXL tree (2/4 heads)
    mesh = mesh_mod.make_mesh(data=4, model=2)
    tp_imgs = tp.generate_images_tp(prompts, mesh=mesh, models=models, **kw)
    assert tp_imgs.shape == single.shape
    assert np.abs(tp_imgs.astype(int) - single.astype(int)).max() <= 1


def test_tp_guidance_extras_match_replicated(tiny_cfg, tiny_models,
                                             tiny_tokenizer):
    """PAG/SAG/variation under Megatron TP (model=4, +2-way DP) match the
    single-device run — the extra guidance evals partition like the main
    UNet call (round-3-late features)."""
    prompts = ["a cat", "a dog"]
    kw = dict(tokenizer=tiny_tokenizer, seed=3, n_inference_steps=N_STEPS,
              config=tiny_cfg, height=H, width=W, pag_scale=1.5,
              sag_scale=0.5, variation_seed=2, variation_strength=0.4)
    single = sdt.generate_images(prompts, models=tiny_models, **kw)

    mesh = mesh_mod.make_mesh(data=2, model=4)
    tp_imgs = tp.generate_images_tp(prompts, mesh=mesh, models=tiny_models,
                                    **kw)
    assert tp_imgs.shape == single.shape
    assert np.abs(tp_imgs.astype(int) - single.astype(int)).max() <= 1
