"""A/B experiment: full-UNet forward time under GroupNorm lowering variants.

The round-2 trace (benchmarks/trace_unet.py) shows XLA materializing several
conv outputs in f32 because group_norm's x.astype(f32) gets fused into the
conv epilogue — doubling the write+read bandwidth of every GN-adjacent
activation.  Variants probe whether steering the cast changes the choice:

  baseline   — current norm.group_norm (pre-cast to f32)
  acc_dtype  — no pre-cast; reductions carry dtype=f32 (convert inside the
               reduce fusion); centered/normalize math recomputed per consumer
  bf16_stats — stats fully in bf16 (numerics probe only — NOT shippable;
               bounds what the dtype lever could ever buy)

Each variant recompiles the whole UNet (~minutes via the axon relay); run in
background.  Chained fori_loop timing, fetch-forced, fetch baseline removed.
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


def bench(fn, *args, iters=5):
    fetch(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def gn_acc_dtype(params, x, num_groups=32, eps=1e-5, policy=None):
    orig = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    xc = xg.astype(jnp.float32) - mean
    var = jnp.mean(xc * xc, axis=(1, 3), keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig)


def gn_bf16_stats(params, x, num_groups=32, eps=1e-5, policy=None):
    n = x.shape[0]
    c = x.shape[-1]
    xg = x.reshape(n, -1, num_groups, c // num_groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    xc = xg - mean
    var = jnp.mean(xc * xc, axis=(1, 3), keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    return y * params["scale"].astype(x.dtype) + params["bias"].astype(x.dtype)


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config
    from pytorch_stable_diffusion_tpu.ops import norm

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (2, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)

    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    orig_gn = norm.group_norm
    variants = [
        ("baseline", orig_gn),
        ("acc_dtype", gn_acc_dtype),
        ("bf16_stats", gn_bf16_stats),
    ]
    ref = None
    for name, fn in variants:
        norm.group_norm = fn

        @jax.jit
        def chained(p, l, c):
            def body(i, x):
                return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas").astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)

        t = (bench(chained, up, lat, ctx) - base) / R
        out = np.asarray(jnp.ravel(chained(up, lat, ctx))[:4], np.float32)
        rec = {"variant": name, "unet_fwd_ms": round(t * 1e3, 3),
               "out_head": [round(float(v), 4) for v in out]}
        if ref is None:
            ref = t
        else:
            rec["vs_baseline_pct"] = round(100 * (t - ref) / ref, 1)
        print(json.dumps(rec), flush=True)
    norm.group_norm = orig_gn


if __name__ == "__main__":
    main()
