"""Batch-8 (headline-config) probes: flash block sweep at the 64-bh grid,
isolated GroupNorm cost at B=8, and flat-vs-conv attention block form.

Trace findings (trace_unet.py at CFG batch 8): flash 3.24 ms/call
(53 TFLOP/s vs 62 standalone at bh=16), GN-stat fusions up to 1.28 ms where
pure bandwidth predicts ~0.05 ms, 3.6 ms of layout copies.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    # 1. flash block sweep at the batch-8 grid (bh=64)
    b, h, s, d = 8, 8, 4096, 40
    q = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 3), (b, h, s, d), jnp.bfloat16)
    flops = 2 * 2 * b * h * s * s * d
    R = 10
    for bq in (None, 256, 1024):
        fn = functools.partial(flash_attention, block_q=bq)

        @jax.jit
        def chain(q, k, v, fn=fn):
            def body(i, carry):
                return fn(carry, k, v).astype(carry.dtype)
            return jax.lax.fori_loop(0, R, body, q)

        t = (bench(chain, q, k, v) - base) / R
        print(json.dumps({"probe": "flash_b8", "bq": bq or "default(512)",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}), flush=True)

    # 2. isolated GN+SiLU at the hot shapes (clean layouts)
    gp = norm.init(320)
    for shape in ((8, 64, 64, 320), (8, 4096, 320), (2, 64, 64, 320)):
        x = jax.random.normal(key, shape, jnp.bfloat16)

        @jax.jit
        def gchain(p, x):
            def body(i, y):
                return norm.group_norm_silu(p, y, 32, policy=cfg.policy
                                            ).astype(y.dtype)
            return jax.lax.fori_loop(0, 20, body, x)

        t = (bench(gchain, gp, x) - base) / 20
        gb = np.prod(shape) * 2 * 2 / 1e9  # read+write bf16
        print(json.dumps({"probe": "gn_silu", "shape": list(shape),
                          "ms": round(t * 1e3, 3),
                          "eff_GBps": round(gb / t, 0)}), flush=True)

    # 3. whole UNet at CFG batch 8: flat (prod) vs conv-form attn block
    from pytorch_stable_diffusion_tpu.ops import attention, conv, linear
    from pytorch_stable_diffusion_tpu.ops.act import geglu

    def conv_block(p, x, context, n_heads, groups, policy, *,
                   backend="xla", reference_quirks=False):
        n, hh, w, c = x.shape
        res_long = x
        y = norm.group_norm_silu(p["norm"], x, groups, policy=policy,
                                 backend=backend, apply_silu=False)
        y = conv.apply(p["conv_in"], y, policy=policy)
        y = y.reshape(n, hh * w, c)
        t = norm.layer_norm(p["ln1"], y, policy=policy)
        y = y + attention.apply(p["self_attn"], t, n_heads=n_heads,
                                backend=backend, policy=policy)
        t = norm.layer_norm(p["ln2"], y, policy=policy)
        y = y + attention.apply(p["cross_attn"], t, context, n_heads=n_heads,
                                backend=backend, policy=policy)
        t = norm.layer_norm(p["ln3"], y, policy=policy)
        t = geglu(linear.apply(p["geglu_proj"], t, policy), reference_quirks)
        y = y + linear.apply(p["geglu_out"], t, policy)
        y = y.reshape(n, hh, w, c)
        return conv.apply(p["conv_out"], y, policy=policy) + res_long

    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (8, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (8, 77, 768), jnp.bfloat16)
    orig = unet.apply_attn_block
    for name, blk in (("flat(prod)", orig), ("conv_form", conv_block)):
        unet.apply_attn_block = blk

        @jax.jit
        def chained(p, l, c):
            def body(i, x):
                return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas").astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)

        t = (bench(chained, up, lat, ctx) - base) / R
        print(json.dumps({"probe": "unet_b8", "block": name,
                          "ms": round(t * 1e3, 3)}), flush=True)
    unet.apply_attn_block = orig


if __name__ == "__main__":
    main()
