"""Micro-bench inside the UNet: res blocks vs attention blocks per resolution.

Identifies where the ~30ms CFG forward goes (chained-timing, axon-safe).
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
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16).unet
    policy = BF16
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"component": "fetch_baseline", "ms": round(base * 1e3, 2)}),
          flush=True)

    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)
    temb = jax.random.normal(key, (1, 1280), jnp.bfloat16)

    # (spatial, channels, n_res_in_model, n_attn_in_model)
    stages = [(64, 320, 2 + 3, 5), (32, 640, 2 + 3, 5), (16, 1280, 2 + 3, 5),
              (8, 1280, 2 + 2 + 3 + 2, 1)]
    total = 0.0
    for s, c, n_res, n_attn in stages:
        x = jax.random.normal(key, (2, s, s, c), jnp.bfloat16)
        rp = unet.init_res_block(key, c, c, 1280, jnp.bfloat16)

        @jax.jit
        def res_chain(p, x, t):
            return jax.lax.fori_loop(
                0, R, lambda i, y: unet.apply_res_block(p, y, t, 32, policy), x)

        t_res = (bench(res_chain, rp, x, temb) - base) / R

        ap = unet.init_attn_block(key, c, 768, jnp.bfloat16)

        @jax.jit
        def attn_chain(p, x, cx):
            return jax.lax.fori_loop(
                0, R, lambda i, y: unet.apply_attn_block(
                    p, y, cx, 8, 32, policy, backend="pallas"), x)

        t_attn = (bench(attn_chain, ap, x, ctx) - base) / R
        contrib = t_res * n_res + t_attn * n_attn
        total += contrib
        print(json.dumps({
            "spatial": s, "channels": c,
            "res_ms": round(t_res * 1e3, 2), "attn_ms": round(t_attn * 1e3, 2),
            "model_contrib_ms": round(contrib * 1e3, 2),
        }), flush=True)

    # up/down-channel res blocks + skip-concat decoders are extra; report sum
    print(json.dumps({"sum_of_stages_ms": round(total * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
