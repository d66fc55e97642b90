"""Hardware smoke: two-pass hires fix at full SD-1.5 scale (512 base ->
bilinear latent upscale -> 1024 second pass, strength 0.6).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/hires_smoke.py
"""
import time

import jax
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from bench import build_models
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

cfg = sdt.sd15_config(policy=sdt.BF16, attention_backend="pallas")
models = build_models(cfg)
tok = make_test_tokenizer(["a", "photo", "of", "dog", "cat", "golden"],
                          max_len=77)
sd = sdt.StableDiffusion(models, tok, cfg)

for rep in range(2):
    t0 = time.time()
    img = sd.hires_fix("a photo of a golden dog", "a cat", height=1024,
                       width=1024, n_inference_steps=20, seed=1337,
                       sampler_name="dpm++", strength=0.6)
    print(f"hires 512->1024 20+20-step: {img.shape} "
          f"range {int(img.min())}..{int(img.max())} {time.time()-t0:.2f}s"
          + (" (incl compile)" if rep == 0 else " warm"), flush=True)
