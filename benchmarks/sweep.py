"""Benchmark sweep over the BASELINE.json target configs.

Configs (BASELINE.md):
  1. txt2img 512x512, 50-step DDPM, CFG, batch 1   (north star: >=1 img/s/chip)
  2. img2img 512x512, strength 0.8                  (VAE encode + 40 steps)
  3. batched txt2img: batch 8, 20-step
  4. hi-res 768x768 txt2img (attention seq 9216)
  5. data-parallel txt2img over all devices

Run on a TPU host:  python benchmarks/sweep.py [--configs 1,3,4]
Emits one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _models(cfg):
    from bench import build_models

    return build_models(cfg)


def _time_config(cfg, models, *, steps, batch, size, img2img=False, iters=3):
    from pytorch_stable_diffusion_tpu.pipeline import _compiled_txt2img

    f = cfg.vae.downsample_factor
    h_lat = w_lat = size // f
    run = _compiled_txt2img(cfg, steps, True, batch, h_lat, w_lat, img2img)
    cond = jnp.full((batch, cfg.clip.max_len), 49406, jnp.int32)
    uncond = jnp.full((batch, cfg.clip.max_len), 49407, jnp.int32)
    image = jnp.zeros((batch, size, size, 3), jnp.float32)
    noises = {"latent_init": jnp.zeros((1,), jnp.float32)}
    start = jnp.int32(int(steps * 0.2)) if img2img else jnp.int32(0)
    key = jax.random.PRNGKey(0)

    def call(k):
        imgs, _ = run(models, cond, uncond, k, jnp.float32(7.5), start,
                      image, noises)
        return imgs

    t0 = time.perf_counter()
    call(key).block_until_ready()
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        call(jax.random.fold_in(key, i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    return {"images_per_sec": batch / p50, "p50_latency_s": p50,
            "compile_s": compile_s, "times": [round(t, 3) for t in times]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()
    wanted = {int(c) for c in args.configs.split(",")}

    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    backend = args.backend if jax.default_backend() == "tpu" else "xla"
    cfg = sd15_config(policy=BF16, attention_backend=backend)
    models = _models(cfg)

    plans = {
        1: dict(name="txt2img-512-50step-b1", steps=50, batch=1, size=512),
        2: dict(name="img2img-512-50step-s0.8", steps=50, batch=1, size=512,
                img2img=True),
        3: dict(name="txt2img-512-20step-b8", steps=20, batch=8, size=512),
        4: dict(name="txt2img-768-50step-b1", steps=50, batch=1, size=768),
    }
    for idx in sorted(wanted):
        plan = dict(plans[idx])
        name = plan.pop("name")
        try:
            r = _time_config(cfg, models, iters=args.iters, **plan)
            print(json.dumps({"config": name, "backend": backend, **r}), flush=True)
        except Exception as e:  # keep sweeping on per-config failure
            print(json.dumps({"config": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
