"""Streamed (manual-DMA) long-KV flash kernel sweep — round 3.

Measures `_flash_attention_streamed` against the chunked multi-pass grid at
the 1024² (16384-token) and 768² (9216-token) shapes, plus numerics vs the
multi-pass kernel.  Findings baked into the dispatch
(ops/pallas/flash_attention.py):

  * 16384 tokens: streamed block_q 512 / group 4096 / chunk 1024 =
    52.1 TFLOP/s > chunked multi-pass 50.0 > round-2 serial ~29 — streamed
    is the non-causal long-KV default.
  * 9216 tokens: the one-pass kernel (block_q 256) stays ahead (54.9 vs
    streamed 53.7), so the one-pass envelope cap stays at 9216.
  * big q blocks lose (bq 1024: 42.8): per-group score liveness
    (bq x group x 4B) forces small groups, and group-merge frequency grows.
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


def bench(fn, *a, iters=5):
    fetch(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import (
        _flash_attention_streamed, flash_attention,
    )

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    for (b, h, s, dh) in ((2, 8, 16384, 40), (2, 8, 9216, 40)):
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, dh),
                              jnp.bfloat16)
        kk = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, dh),
                               jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, dh),
                              jnp.bfloat16)
        flops = 4.0 * b * h * s * s * dh

        got = _flash_attention_streamed(q[:1, :1], kk[:1, :1], v[:1, :1])
        ref = flash_attention(q[:1, :1], kk[:1, :1], v[:1, :1],
                              block_q=256, block_k=2048)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(json.dumps({"shape": [b, h, s, dh],
                          "numerics_max_err": round(err, 5)}), flush=True)

        cases = [("default_dispatch", None),
                 ("streamed_512_4096_1024", (512, 4096, 1024)),
                 ("streamed_256_4096_512", (256, 4096, 512))]
        for label, params in cases:
            try:
                if params is None:
                    @jax.jit
                    def chained(q, kk, v):
                        def body(i, x):
                            return flash_attention(x, kk, v).astype(x.dtype)
                        return jax.lax.fori_loop(0, R, body, q)
                else:
                    bq, grp, ch = params

                    @jax.jit
                    def chained(q, kk, v, _bq=bq, _g=grp, _c=ch):
                        def body(i, x):
                            return _flash_attention_streamed(
                                x, kk, v, block_q=_bq, group=_g,
                                chunk=_c).astype(x.dtype)
                        return jax.lax.fori_loop(0, R, body, q)
                t = (bench(chained, q, kk, v) - base) / R
                print(json.dumps({"shape": [b, h, s, dh], "mode": label,
                                  "ms": round(t * 1e3, 3),
                                  "tflops": round(flops / t / 1e12, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"shape": [b, h, s, dh], "mode": label,
                                  "error": str(e)[:110]}), flush=True)


if __name__ == "__main__":
    main()
