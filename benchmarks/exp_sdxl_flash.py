"""Block/chunk sweep for the SDXL flash shapes (head_dim 64).

The shipped defaults (block_q 512 / chunk 512 one-pass; BSC block_q 256)
were swept at SD-1.5's head_dim 40 (benchmarks/exp_flash_chunked.py).
SDXL runs dh 64: level-1 one-pass at (2, 10, 4096, 64) and level-2/mid BSC
at (2, 1024, 1280) x 20 heads.  Methodology per CLAUDE.md: chain R
iterations inside jit with the output fed back as q, subtract the fetch
baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_sdxl_flash.py
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

R = 50


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench_chain(fn, q, iters=3):
    run = jax.jit(lambda q0: jax.lax.fori_loop(0, R, lambda i, x: fn(x), q0))
    fetch(run(q))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(run(q))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / R


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.ops.pallas import flash_attention as fa

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    # fetch baseline
    base = bench_chain(lambda x: x + 1.0, jnp.zeros((8, 128)))
    print(json.dumps({"note": "per-iter overhead baseline",
                      "ms": round(base * 1e3, 4)}), flush=True)

    # ---- one-pass at SDXL level-1: (2, 10, 4096, 64)
    b, h, s, d = 2, 10, 4096, 64
    q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, d), jnp.bfloat16)
    flops = 2 * 2 * b * h * s * s * d
    orig_pick = fa._pick_chunk
    for bq in (256, 512):
        for chunk in (512, 1024, 2048, 4096):
            if s % chunk or s // chunk > fa._MAX_CHUNKS:
                continue
            fa._pick_chunk = lambda *a, _c=chunk, **kw: _c
            try:
                t = bench_chain(
                    lambda x: fa.flash_attention(x, k, v, block_q=bq), q)
            finally:
                fa._pick_chunk = orig_pick
            print(json.dumps({
                "kernel": "onepass", "shape": [b, h, s, d],
                "block_q": bq, "chunk": chunk,
                "ms": round(t * 1e3, 3),
                "tflops": round(flops / max(t - base, 1e-9) / 1e12, 1),
            }), flush=True)

    # ---- BSC at SDXL level-2/mid: (2, 1024, 1280), 20 heads of 64
    b2, s2, c2, heads = 2, 1024, 1280, 20
    q2 = jax.random.normal(jax.random.fold_in(key, 4), (b2, s2, c2), jnp.bfloat16)
    k2 = jax.random.normal(jax.random.fold_in(key, 5), (b2, s2, c2), jnp.bfloat16)
    v2 = jax.random.normal(jax.random.fold_in(key, 6), (b2, s2, c2), jnp.bfloat16)
    flops2 = 2 * 2 * b2 * heads * s2 * s2 * (c2 // heads)
    for bq in (128, 256, 512):
        for chunk in (512, 1024):
            if s2 % chunk:
                continue
            t = bench_chain(
                lambda x: fa.flash_attention_bsc(x, k2, v2, n_heads=heads,
                                                 block_q=bq, chunk=chunk), q2)
            print(json.dumps({
                "kernel": "bsc", "shape": [b2, s2, c2], "heads": heads,
                "block_q": bq, "chunk": chunk,
                "ms": round(t * 1e3, 3),
                "tflops": round(flops2 / max(t - base, 1e-9) / 1e12, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
