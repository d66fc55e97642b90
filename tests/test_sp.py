"""Sequence (spatial) parallelism — batch-1 latency mode (parallel/sp.py).

The denoise loop's UNet input is sharding-constrained on the latent-H axis
over the mesh's model axis; GSPMD partitions convs (halo exchange) and
attention (q-sharded, gathered KV).  Must match the single-device pipeline.
"""

import numpy as np
import pytest

import jax

import pytorch_stable_diffusion_tpu as sdt


def _dev4():
    return jax.devices()[:4]
from pytorch_stable_diffusion_tpu.core import mesh as mesh_mod
from pytorch_stable_diffusion_tpu.parallel import sp

N_STEPS = 2
H = W = 32  # latent 16: divisible by the 4-way model axis


def test_sp_matches_single_device(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(tokenizer=tiny_tokenizer, seed=3, n_inference_steps=N_STEPS,
              config=tiny_cfg, height=H, width=W)
    single = sdt.generate("a cat", "", models=tiny_models, **kw)

    mesh = mesh_mod.make_mesh(data=1, model=4, devices=_dev4())
    spatial = sp.generate_spatial("a cat", "", mesh=mesh, models=tiny_models,
                                  **kw)
    assert spatial.shape == single.shape
    # halo-exchanged convs + gathered-KV attention reassociate fp sums
    assert np.abs(spatial.astype(int) - single.astype(int)).max() <= 1


def test_sp_img2img_matches_single_device(tiny_cfg, tiny_models,
                                          tiny_tokenizer):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(H, W, 3)).astype(np.uint8)
    kw = dict(tokenizer=tiny_tokenizer, seed=3, n_inference_steps=N_STEPS,
              config=tiny_cfg, height=H, width=W, input_image=img,
              strength=0.7)
    single = sdt.generate("a cat", "", models=tiny_models, **kw)
    mesh = mesh_mod.make_mesh(data=1, model=4, devices=_dev4())
    spatial = sp.generate_spatial("a cat", "", mesh=mesh, models=tiny_models,
                                  **kw)
    assert np.abs(spatial.astype(int) - single.astype(int)).max() <= 1


def test_sp_validations(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer,
              n_inference_steps=N_STEPS, config=tiny_cfg)
    with pytest.raises(ValueError, match="model"):
        # mesh without a model axis > 1
        sdt.generate("a cat", "", mesh=mesh_mod.make_mesh(data=8, model=1),
                     sequence_parallel=True, height=H, width=W, **kw)
    with pytest.raises(ValueError, match="divisible"):
        # latent height 2 not divisible by model axis 4
        sdt.generate("a cat", "", mesh=mesh_mod.make_mesh(data=1, model=4, devices=_dev4()),
                     sequence_parallel=True, height=4, width=32, **kw)
    # approximation features that need the full token grid are rejected,
    # not silently dropped (ADVICE r3: hypertile was silently disabled)
    import dataclasses

    sp_mesh = mesh_mod.make_mesh(data=1, model=4, devices=_dev4())
    for field, match in ((dict(tome=(0.5, 2, 2, 64)), "ToMe"),
                         (dict(hypertile=(4, 64)), "Hypertile")):
        cfg2 = dataclasses.replace(
            tiny_cfg, unet=dataclasses.replace(tiny_cfg.unet, **field))
        with pytest.raises(ValueError, match=match):
            sdt.generate("a cat", "", mesh=sp_mesh, sequence_parallel=True,
                         height=H, width=W, **dict(kw, config=cfg2))


def test_sp_pallas_backend_matches_single_device(tiny_cfg, tiny_models,
                                                 tiny_tokenizer):
    """SP with the pallas attention backend: self-attention runs inside a
    shard_map (gathered KV, per-shard flash kernel) — round 3's upgrade
    over forcing the XLA path."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, attention_backend="pallas")
    kw = dict(tokenizer=tiny_tokenizer, seed=5, n_inference_steps=N_STEPS,
              config=cfg, height=H, width=W)
    single = sdt.generate("a cat", "", models=tiny_models, **kw)
    mesh = mesh_mod.make_mesh(data=1, model=4, devices=_dev4())
    spatial = sp.generate_spatial("a cat", "", mesh=mesh, models=tiny_models,
                                  **kw)
    assert np.abs(spatial.astype(int) - single.astype(int)).max() <= 1


def test_sp_composes_with_dp(tiny_cfg, tiny_models, tiny_tokenizer):
    """DP x SP on one mesh: batch sharded over 'data', spatial over
    'model' — output equals the single-device batched run."""
    import pytorch_stable_diffusion_tpu.pipeline as pipeline_mod
    from pytorch_stable_diffusion_tpu.parallel.dp import replicate_params

    prompts = ["a cat", "a dog"]
    kw = dict(tokenizer=tiny_tokenizer, seed=3, n_inference_steps=N_STEPS,
              config=tiny_cfg, height=H, width=W)
    single = sdt.generate_images(prompts, models=tiny_models, **kw)

    mesh = mesh_mod.make_mesh(data=2, model=4)  # all 8 virtual devices
    models = replicate_params(tiny_models, mesh)
    both, _ = pipeline_mod._run_generate(prompts, "", models=models,
                                         mesh=mesh, sequence_parallel=True,
                                         **kw)
    assert np.abs(np.asarray(both).astype(int)
                  - single.astype(int)).max() <= 1


def test_sp_sdxl_matches_single_device(tiny_tokenizer):
    """Spatial sharding generalizes to the SDXL tree: stacked transformer
    blocks run per-shard, add_cond stays replicated."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(17)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    kw = dict(tokenizer=tiny_tokenizer, seed=6, n_inference_steps=N_STEPS,
              config=cfg, height=H, width=W, sampler_name="euler")
    single = sdt.generate("a cat", "", models=models, **kw)
    mesh = mesh_mod.make_mesh(data=1, model=4, devices=_dev4())
    spatial = sp.generate_spatial("a cat", "", mesh=mesh, models=models, **kw)
    assert spatial.shape == single.shape
    assert np.abs(spatial.astype(int) - single.astype(int)).max() <= 1
