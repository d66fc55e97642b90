"""Flash-attention block-size sweep at the SD hot shapes (axon-safe timing)."""

from __future__ import annotations

import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R = 30


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
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    # (name, b, h, sq, sk, d)
    shapes = [
        ("self64", 2, 8, 4096, 4096, 40),
        ("cross64", 2, 8, 4096, 77, 40),
        ("self32", 2, 8, 1024, 1024, 80),
    ]
    grids = {
        "self64": [(128, 4096), (256, 4096), (512, 4096),   # one-pass
                   (256, 512), (256, 2048)],                # multi-pass refs
        "cross64": [(512, 128), (2048, 128)],
        "self32": [(256, 1024), (512, 1024), (1024, 1024)],
    }
    for name, b, h, sq, sk, d in shapes:
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, sq, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 2), (b, h, sk, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (b, h, sk, d), jnp.bfloat16)
        flops = 2 * 2 * b * h * sq * sk * d
        for bq, bk in grids[name]:
            try:
                @jax.jit
                def chain(q, k, v):
                    # q must depend on the carry or XLA hoists the kernel out
                    # of the loop (loop-invariant code motion).
                    def body(i, carry):
                        o = flash_attention(carry, k, v, block_q=bq, block_k=bk)
                        return o.astype(carry.dtype)
                    return jax.lax.fori_loop(0, R, body, q)

                t = (bench(chain, q, k, v) - base) / R
                print(json.dumps({"shape": name, "bq": bq, "bk": bk,
                                  "ms": round(t * 1e3, 3),
                                  "tflops": round(flops / t / 1e12, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({"shape": name, "bq": bq, "bk": bk,
                                  "error": repr(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
