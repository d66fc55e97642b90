"""In-situ A/B: whole-UNet forward (CFG batch 8 and 2) with the shipping
GroupNorm vs the two-stage per-channel-sums formulation (exp_gn2.py).
Standalone GN microbenches sit below the fetch-noise floor; the UNet-level
number is the only trustworthy comparison."""

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
EPS = 1e-5


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
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config
    from pytorch_stable_diffusion_tpu.ops import norm
    from pytorch_stable_diffusion_tpu.ops.act import silu

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    def gn2_silu(params, x, num_groups=32, eps=EPS, policy=None, *,
                 backend="xla", apply_silu=True):
        n, c = x.shape[0], x.shape[-1]
        g = num_groups
        cg = c // g
        xf = x.reshape(n, -1, c)
        s = xf.shape[1]
        ch_sum = jnp.sum(xf, axis=1, dtype=jnp.float32)
        ch_sq = jnp.sum(jnp.square(xf.astype(jnp.float32)), axis=1)
        cnt = s * cg
        g_mean = ch_sum.reshape(n, g, cg).sum(-1) / cnt
        g_sq = ch_sq.reshape(n, g, cg).sum(-1) / cnt
        var = jnp.maximum(g_sq - jnp.square(g_mean), 0.0)
        inv = jax.lax.rsqrt(var + eps)
        scale = params["scale"].astype(jnp.float32)
        bias = params["bias"].astype(jnp.float32)
        a = jnp.repeat(inv, cg, axis=1) * scale[None, :]
        b = bias[None, :] - jnp.repeat(g_mean * inv, cg, axis=1) * scale[None, :]
        y = xf.astype(jnp.float32) * a[:, None, :] + b[:, None, :]
        if apply_silu:
            y = silu(y)
        return y.reshape(x.shape).astype(x.dtype)

    orig = norm.group_norm_silu
    for b in (8, 2):
        lat = jax.random.normal(key, (b, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(key, (b, 77, 768), jnp.bfloat16)
        ref = None
        for name, fn in (("current", orig), ("two_stage", gn2_silu)):
            norm.group_norm_silu = fn

            @jax.jit
            def chained(p, l, c):
                def body(i, x):
                    return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                      attention_backend="pallas").astype(x.dtype)
                return jax.lax.fori_loop(0, R, body, l)

            t = (bench(chained, up, lat, ctx) - base) / R
            out = np.asarray(jnp.ravel(chained(up, lat, ctx))[:2], np.float32)
            rec = {"cfg_batch": b, "gn": name, "unet_fwd_ms": round(t * 1e3, 3),
                   "out": [round(float(v), 4) for v in out]}
            if ref is None:
                ref = t
            else:
                rec["vs_current_pct"] = round(100 * (t - ref) / ref, 1)
            print(json.dumps(rec), flush=True)
        norm.group_norm_silu = orig


if __name__ == "__main__":
    main()
