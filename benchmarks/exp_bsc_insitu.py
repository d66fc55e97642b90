"""In-situ A/B: whole UNet with self-attention routed through the BSC
(no-head-transpose) kernel from exp_flash_bsc.py vs the shipping path.
Standalone the BSC kernel only breaks even; the hypothesis is that removing
the (B,S,H,D)<->(B,H,S,D) boundary also removes the S-minor layout
assignments XLA propagates into neighboring fusions (the 0.7-1.3 ms
residual-add/GN fusions in the batch-8 trace)."""

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


def main():
    from exp_flash_bsc import bsc_flash
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config
    from pytorch_stable_diffusion_tpu.ops import attention, linear

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    orig_apply = attention.apply

    def bsc_apply(params, x, context=None, *, n_heads, causal=False,
                  backend="xla", policy=None):
        s = x.shape[1]
        if (backend == "pallas" and context is None and not causal
                and s >= 256 and s % 256 == 0):
            q, k, v = attention._fused_proj(
                (params["q"], params["k"], params["v"]), x, policy)
            chunk = 1024 if s % 1024 == 0 else s
            o = bsc_flash(q, k, v, n_heads=n_heads, block_q=256, chunk=chunk)
            return linear.apply(params["out"], o, policy)
        return orig_apply(params, x, context, n_heads=n_heads, causal=causal,
                          backend=backend, policy=policy)

    for b in (8, 2):
        lat = jax.random.normal(key, (b, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(key, (b, 77, 768), jnp.bfloat16)
        ref = None
        for name, fn in (("shipping", orig_apply), ("bsc", bsc_apply)):
            attention.apply = fn

            @jax.jit
            def chained(p, l, c):
                def body(i, x):
                    return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                      attention_backend="pallas").astype(x.dtype)
                return jax.lax.fori_loop(0, R, body, l)

            t = (bench(chained, up, lat, ctx) - base) / R
            out = np.asarray(jnp.ravel(chained(up, lat, ctx))[:2], np.float32)
            rec = {"cfg_batch": b, "attn": name,
                   "unet_fwd_ms": round(t * 1e3, 3),
                   "out": [round(float(v), 4) for v in out]}
            if ref is None:
                ref = t
            else:
                rec["vs_shipping_pct"] = round(100 * (t - ref) / ref, 1)
            print(json.dumps(rec), flush=True)
        attention.apply = orig_apply


if __name__ == "__main__":
    main()
