"""Hi-res VAE decode on hardware: 768² whole vs tiled, 1024²/1536² tiled.

Demonstrates the memory-bounded decode path (models/vae.apply_decoder_tiled)
at resolutions where whole decode grows 512-channel image-resolution
activations (1024²: ~4 GB of f32-equivalent traffic per sample; 1536² whole
would not fit alongside weights).  Chained timing, fetch-forced (axon relay).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(fn, *args, iters=3):
    fetch(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import vae
    from pytorch_stable_diffusion_tpu.models.config import sd15_config
    from pytorch_stable_diffusion_tpu.utils.metrics import psnr

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    dp = vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae,
                          dtype=jnp.bfloat16)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    def whole(lat):
        return vae.apply_decoder(dp, lat, cfg.vae, cfg.policy)

    def tiled(lat, tile):
        return vae.apply_decoder_tiled(dp, lat, cfg.vae, cfg.policy, tile=tile)

    for size, tile, run_whole in [(768, 48, True), (1024, 64, True),
                                  (1536, 64, False)]:
        hl = size // 8
        lat = jax.random.normal(key, (1, hl, hl, 4), jnp.float32)
        jt = jax.jit(lambda l, t=tile: tiled(l, t))
        try:
            t_tiled = bench(jt, lat) - base
            rec = {"size": size, "tile": tile,
                   "tiled_ms": round(t_tiled * 1e3, 1)}
        except Exception as e:
            rec = {"size": size, "tile": tile, "tiled_error": repr(e)[:160]}
            print(json.dumps(rec), flush=True)
            continue
        if run_whole:
            try:
                jw = jax.jit(whole)
                t_whole = bench(jw, lat) - base
                rec["whole_ms"] = round(t_whole * 1e3, 1)
                rec["psnr_tiled_vs_whole_db"] = round(
                    float(psnr(np.asarray(jw(lat), np.float32),
                               np.asarray(jt(lat), np.float32))), 1)
            except Exception as e:
                rec["whole_error"] = repr(e)[:160]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
