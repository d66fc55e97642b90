"""In-situ A/B: BSC kernel block_q 256 (shipped default, swept at SD-1.5's
head_dim 40) vs 512/chunk-1024 (the exp_sdxl_flash.py kernel-level winner at
SDXL's head_dim-64 1024-token shape) — measured on the WHOLE UNet CFG
forward, per the round-2 lesson that isolated-op wins don't transfer.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_sdxl_bsc_insitu.py
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

R = 10


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench_chain(fn, params, x0, iters=3):
    # params ride as a jit argument (NOT a closure constant — an SDXL UNet
    # captured as constants is 5.1 GB of baked-in literals and stalls
    # lowering; observed 17 Aug)
    run = jax.jit(lambda p, x: jax.lax.fori_loop(
        0, R, lambda i, y: fn(p, y), x))
    fetch(run(params, x0))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(run(params, x0))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / R


def main():
    import pytorch_stable_diffusion_tpu.ops.pallas.flash_attention as fa
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import (sd15_config,
                                                            sdxl_config)

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    orig_bsc = fa.flash_attention_bsc

    def make_fwd(cfg, h_lat, w_lat, d_ctx, add_dim):
        up = unet.init(jax.random.fold_in(key, 3), cfg.unet,
                       dtype=jnp.bfloat16)
        ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, 77, d_ctx),
                                jnp.bfloat16)
        add = None if add_dim is None else jax.random.normal(
            jax.random.fold_in(key, 2), (2, add_dim), jnp.float32)

        def fwd(p, lat):
            return unet.apply(p, lat, ctx, jnp.float32(500.0), cfg.unet,
                              BF16, attention_backend="pallas",
                              add_cond=add).astype(jnp.bfloat16)

        lat0 = jax.random.normal(jax.random.fold_in(key, 4),
                                 (2, h_lat, w_lat, 4), jnp.bfloat16)
        return fwd, up, lat0

    def bsc512(q, k, v, *, n_heads, block_q=256, chunk=None):
        return orig_bsc(q, k, v, n_heads=n_heads, block_q=512, chunk=1024)

    for fam, mk in (
        ("sdxl_1024", lambda: make_fwd(sdxl_config(policy=BF16), 128, 128,
                                       2048, 2816)),
        ("sd15_512", lambda: make_fwd(sd15_config(policy=BF16), 64, 64,
                                      768, None)),
    ):
        fwd, up, lat0 = mk()
        fa.flash_attention_bsc = orig_bsc
        t_a = bench_chain(fwd, up, lat0)
        fa.flash_attention_bsc = bsc512
        try:
            t_b = bench_chain(fwd, up, lat0)
        except Exception as e:  # VMEM overflow etc. — record and move on
            t_b = None
            print(json.dumps({"family": fam, "bsc512_error": str(e)[:200]}),
                  flush=True)
        finally:
            fa.flash_attention_bsc = orig_bsc
        print(json.dumps({
            "family": fam,
            "default_ms": round(t_a * 1e3, 2),
            "bq512_ms": None if t_b is None else round(t_b * 1e3, 2),
            "delta_pct": None if t_b is None
            else round((t_b / t_a - 1) * 100, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
