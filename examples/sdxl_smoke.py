"""SDXL hardware smoke: base (2.57B) at native 1024², then the refiner
(2.26B) over the base output — the full two-stage ensemble on one chip.

The reference covers only SD-1.5 (`/root/reference/sd/`); SDXL is the
elective family tier.  This runs the real topologies (random weights — no
SDXL checkpoint on this host) end-to-end on the chip: dual text towers,
depth-(1,2,10) UNet with the 2816-d added conditioning, 0.13025 VAE;
then the single-tower refiner with aesthetic-score conditioning.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/sdxl_smoke.py
"""
import time

import jax
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models import clip, unet, vae
from pytorch_stable_diffusion_tpu.models.config import (sdxl_config,
                                                        sdxl_refiner_config)
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer


def build_sdxl_models(cfg, seed=0):
    key = jax.random.PRNGKey(seed)
    dtype = cfg.policy.param_dtype
    return {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip, dtype=dtype),
        "clip2": clip.init(jax.random.fold_in(key, 4), cfg.clip2, dtype=dtype),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae,
                                    dtype=dtype),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae,
                                    dtype=dtype),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet,
                               dtype=dtype),
    }


def main():
    enable_compilation_cache()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = sdxl_config(policy=BF16, attention_backend=backend)
    models = build_sdxl_models(cfg)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(models["diffusion"]))
    print(f"UNet params: {n_params:,}", flush=True)
    tok = make_test_tokenizer(["a", "photo", "of", "dog", "cat", "golden"],
                              max_len=77)

    steps = 20
    t0 = time.time()
    img, base_lat = sdt.generate("a photo of a golden dog", "a cat",
                                 models=models, tokenizer=tok, seed=1337,
                                 cfg_scale=7.0, sampler_name="dpm++",
                                 n_inference_steps=steps, height=1024,
                                 width=1024, config=cfg, return_latents=True)
    print(f"sdxl 1024^2 {steps}-step: {img.shape} {img.dtype} "
          f"range {int(img.min())}..{int(img.max())} "
          f"({time.time()-t0:.1f}s incl compile)", flush=True)

    for _ in range(2):
        t0 = time.time()
        img2 = sdt.generate("a photo of a golden dog", "a cat", models=models,
                            tokenizer=tok, seed=1337, cfg_scale=7.0,
                            sampler_name="dpm++", n_inference_steps=steps,
                            height=1024, width=1024, config=cfg)
        dt = time.time() - t0
        print(f"repeat: {dt:.2f}s ({dt/steps*1000:.1f} ms/step incl "
              f"text+decode)  deterministic: {bool((img == img2).all())}",
              flush=True)

    # --- refiner pass: base image -> img2img at moderate strength -------
    # (the sgm ensemble hands the base output to the 2.26B refiner; base
    # and refiner both resident would crowd 16 GB HBM at 1024², so free
    # the base weights first — serving would run them on separate chips)
    del models
    rcfg = sdxl_refiner_config(policy=BF16, attention_backend=backend)
    rmodels = build_refiner_models(rcfg)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(rmodels["diffusion"]))
    print(f"refiner UNet params: {n_params:,}", flush=True)
    # latent handoff (init_latents): base and refiner share the 0.13025
    # VAE space, so the refiner consumes the base LATENTS directly — the
    # sgm ensemble-of-experts scheme, skipping the decode/encode round trip
    t0 = time.time()
    ref = sdt.generate("a photo of a golden dog", "a cat",
                       init_latents=base_lat, strength=0.3, models=rmodels,
                       tokenizer=tok, seed=1337, cfg_scale=5.0,
                       sampler_name="dpm++", n_inference_steps=steps,
                       height=1024, width=1024, config=rcfg)
    print(f"refiner 1024^2 strength-0.3 (latent handoff): {ref.shape} "
          f"range {int(ref.min())}..{int(ref.max())} "
          f"({time.time()-t0:.1f}s incl compile)", flush=True)
    t0 = time.time()
    ref2 = sdt.generate("a photo of a golden dog", "a cat",
                        init_latents=base_lat, strength=0.3, models=rmodels,
                        tokenizer=tok, seed=1337, cfg_scale=5.0,
                        sampler_name="dpm++", n_inference_steps=steps,
                        height=1024, width=1024, config=rcfg)
    print(f"refiner repeat: {time.time()-t0:.2f}s "
          f"deterministic: {bool((ref == ref2).all())}", flush=True)


def build_refiner_models(cfg, seed=1):
    key = jax.random.PRNGKey(seed)
    dtype = cfg.policy.param_dtype
    return {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip, dtype=dtype),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae,
                                    dtype=dtype),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae,
                                    dtype=dtype),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet,
                               dtype=dtype),
    }


if __name__ == "__main__":
    main()
