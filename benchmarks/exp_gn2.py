"""GroupNorm lowering shootout at the hot SD shapes.

exp_batch8.py showed the shipping GN+SiLU at (8,64,64,320) running at
45 GB/s effective — 18x under HBM bandwidth, isolated, clean layouts.  This
sweeps formulations to find what XLA lowers well:

  current      — reshape (N,S,G,cg), joint reduce over (S, cg)
  two_stage    — per-channel spatial sums (clean axis-1 reduce) then a tiny
                 (N,C)->(N,G) group fold; E[x^2]-E[x]^2 variance
  transpose_free_f32 — current but keeping stats/normalize all in one dtype
  (the round-1 pallas_gn kernel was measured here too before its round-3
  deletion — known loser; grid per sample)
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
EPS = 1e-5


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(fn, *args, iters=7):
    fetch(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def silu(x):
    return x * jax.nn.sigmoid(x)


def gn_current(scale, bias, x, g):
    n, c = x.shape[0], x.shape[-1]
    xg = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + EPS)).reshape(x.shape)
    return silu(y * scale + bias).astype(x.dtype)


def gn_two_stage(scale, bias, x, g):
    n, c = x.shape[0], x.shape[-1]
    xf = x.reshape(n, -1, c)
    s = xf.shape[1]
    cg = c // g
    ch_sum = jnp.sum(xf, axis=1, dtype=jnp.float32)          # (N, C)
    ch_sq = jnp.sum(jnp.square(xf.astype(jnp.float32)), axis=1)
    cnt = s * cg
    g_mean = ch_sum.reshape(n, g, cg).sum(-1) / cnt           # (N, G)
    g_sq = ch_sq.reshape(n, g, cg).sum(-1) / cnt
    var = jnp.maximum(g_sq - jnp.square(g_mean), 0.0)
    inv = jax.lax.rsqrt(var + EPS)                            # (N, G)
    # per-channel affine folded with per-group stats: y = x*a_c + b_c
    a = jnp.repeat(inv, cg, axis=1) * scale[None, :]          # (N, C)
    b = bias[None, :] - jnp.repeat(g_mean * inv, cg, axis=1) * scale[None, :]
    y = xf.astype(jnp.float32) * a[:, None, :] + b[:, None, :]
    return silu(y).reshape(x.shape).astype(x.dtype)


def gn_f32_flat(scale, bias, x, g):
    # like current but normalize on the flat (N, S, C) view
    n, c = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    y = (xf * inv - mean * inv).reshape(x.shape)
    return silu(y * scale + bias).astype(x.dtype)


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    variants = [("current", gn_current), ("two_stage", gn_two_stage),
                ("f32_flat", gn_f32_flat)]
    for shape in ((8, 64, 64, 320), (8, 32, 32, 640), (2, 64, 64, 320)):
        c = shape[-1]
        scale = jnp.ones((c,), jnp.float32) * 1.1
        bias = jnp.zeros((c,), jnp.float32) + 0.1
        x = jax.random.normal(key, shape, jnp.bfloat16)
        ref = None
        for name, fn in variants:
            @jax.jit
            def chain(s_, b_, x_, fn=fn):
                def body(i, y):
                    return fn(s_, b_, y, 32)
                return jax.lax.fori_loop(0, R, body, x_)

            t = (bench(chain, scale, bias, x) - base) / R
            out = np.asarray(jnp.ravel(chain(scale, bias, x))[:2], np.float32)
            gb = np.prod(shape) * 2 * 2 / 1e9
            rec = {"shape": list(shape), "variant": name,
                   "ms": round(t * 1e3, 3), "eff_GBps": round(gb / t, 0),
                   "out": [round(float(v), 4) for v in out]}
            if ref is None:
                ref = t
            else:
                rec["vs_current_pct"] = round(100 * (t - ref) / ref, 1)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
