"""BSC kernel compile-smoke + timing at the worst-case dispatched shapes.

Round 3 replaced the head-serialization marker (`q + sum(l)*0.0`, legally
constant-foldable) with `lax.optimization_barrier` (ADVICE r2).  The marker
exists to keep only ONE head's chunk score blocks live in scoped VMEM; this
script proves the barrier form still compiles and stays fast at the largest
shapes `bsc_fits` admits (the allocator sits ~100 KB under the 16 MB limit
there — see the batch guard in ops/pallas/flash_attention.py).
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
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import (
        bsc_fits, flash_attention_bsc,
    )

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    # worst cases the dispatcher admits: CFG batch 8 x 4096 tokens x C=320
    # (the vmem cliff edge), plus the other SD levels
    cases = [(8, 4096, 320, 8), (8, 1024, 640, 8), (8, 256, 1280, 8),
             (2, 4096, 320, 8), (16, 4096, 320, 8)]  # 16: should NOT fit
    for b, s, c, heads in cases:
        fits = bsc_fits(s, s, c, 2, batch=b)
        rec = {"shape": [b, s, c], "bsc_fits": fits}
        if not fits:
            print(json.dumps(rec), flush=True)
            continue
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, s, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 2), (b, s, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (b, s, c), jnp.bfloat16)

        @jax.jit
        def chained(q, k, v):
            def body(i, x):
                return flash_attention_bsc(x, k, v, n_heads=heads).astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, q)

        t = (bench(chained, q, k, v) - base) / R
        dh = c // heads
        flops = 4.0 * b * heads * s * s * dh
        # numerics spot-check vs XLA
        got = flash_attention_bsc(q, k, v, n_heads=heads)
        qs = q.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
        ks = k.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
        vs = v.reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
        ref = _xla_attention(qs, ks, vs, False, FP32)
        ref = ref.transpose(0, 2, 1, 3).reshape(b, s, c)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        rec.update({"ms": round(t * 1e3, 3),
                    "tflops": round(flops / t / 1e12, 1),
                    "max_err": round(err, 4)})
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
