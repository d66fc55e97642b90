"""Long-KV flash attention sweep — the 1024² (16384-token) frontier.

VERDICT r2 #3: 16384-token KV exceeds the one-pass chunked kernel's VMEM
envelope and fell back to the multi-pass grid, whose serial QK->exp->PV
chain measured 45 vs 62 TFLOP/s at 4096 tokens.  Round 3 ports the
dependence-free chunk trick INTO the multi-pass kernel (chunk within each
block_k step, closed-form merge into the running m/l/acc); this sweep
measures it at the 1024² shapes and pins block_q/block_k/chunk.

Rows: serial (block_chunk == block_k, the round-2 form) vs chunked, over a
(block_q, block_k) grid.  FLOPs = 4·B·H·Sq·Sk·Dh (fwd QK^T + PV).
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

R = 20


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(fn, *args, iters=5):
    fetch(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    # (B, H, S, Dh): 1024² CFG batch-1 -> B=2; also 768² (9216) multipass
    # for comparison against its one-pass number
    for (b, h, s, dh) in ((2, 8, 16384, 40), (1, 8, 16384, 40),
                          (2, 8, 9216, 40)):
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, dh),
                              jnp.bfloat16)
        kk = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, dh),
                               jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, dh),
                              jnp.bfloat16)
        flops = 4.0 * b * h * s * s * dh

        def run(bq, bk, bc):
            @jax.jit
            def chained(q, kk, v):
                def body(i, x):
                    return flash_attention(x, kk, v, block_q=bq, block_k=bk,
                                           block_chunk=bc).astype(x.dtype)
                return jax.lax.fori_loop(0, R, body, q)
            t = (bench(chained, q, kk, v) - base) / R
            return t

        for bq in (256, 512):
            for bk in (1024, 2048, 4096):
                for label, bc in (("serial", bk), ("chunked", None)):
                    try:
                        t = run(bq, bk, bc)
                        print(json.dumps({
                            "shape": [b, h, s, dh], "block_q": bq,
                            "block_k": bk, "mode": label,
                            "ms": round(t * 1e3, 3),
                            "tflops": round(flops / t / 1e12, 1)}), flush=True)
                    except Exception as e:  # noqa: BLE001 - sweep survives OOM
                        print(json.dumps({
                            "shape": [b, h, s, dh], "block_q": bq,
                            "block_k": bk, "mode": label,
                            "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
