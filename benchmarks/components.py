"""Component-level timing on the real chip: where does the time go?

IMPORTANT (axon relay): block_until_ready() does NOT block — only a
device->host fetch does.  So every timing here chains R iterations inside a
fori_loop and fetches one scalar, then divides; a fetch-only baseline is
reported for reference.
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

R = 10  # chained repetitions per measurement


def fetch(x) -> float:
    return float(jnp.ravel(x)[0])


def timed_fetch(fn, *args, iters=3):
    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    hl = size // 8

    base = timed_fetch(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"component": "fetch_baseline", "ms": round(base * 1e3, 2)}),
          flush=True)

    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (2, hl, hl, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)

    for backend in ("pallas", "xla"):
        @jax.jit
        def chained(p, l, c):
            def body(i, x):
                out = unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                 attention_backend=backend)
                return out.astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)

        t = (timed_fetch(chained, up, lat, ctx) - base) / R
        print(json.dumps({
            "component": f"unet_fwd_cfg2_{backend}", "size": size,
            "ms": round(t * 1e3, 2),
            "s_per_image_50step": round(t * 50, 3),
            "mfu_est": round(2 * 0.680e12 * (size / 512) ** 2 / t / 197e12, 3),
        }), flush=True)

    dp = vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae, dtype=jnp.bfloat16)
    lat1 = jax.random.normal(key, (1, hl, hl, 4), jnp.float32)
    for backend in ("pallas", "xla"):
        @jax.jit
        def dec_chained(p, l):
            def body(i, acc):
                img = vae.apply_decoder(p, l * (1.0 + 1e-6 * i), cfg.vae,
                                        cfg.policy, attention_backend=backend)
                return acc + jnp.sum(img)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        t = (timed_fetch(dec_chained, dp, lat1) - base) / R
        print(json.dumps({"component": f"vae_decode_{backend}", "size": size,
                          "ms": round(t * 1e3, 2)}), flush=True)

    cp = clip.init(jax.random.fold_in(key, 0), cfg.clip, dtype=jnp.bfloat16)
    toks = jnp.full((2, 77), 49406, jnp.int32)

    @jax.jit
    def clip_chained(p, t_):
        def body(i, acc):
            return acc + jnp.sum(clip.apply(p, t_ + i * 0, cfg.clip, cfg.policy))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    t = (timed_fetch(clip_chained, cp, toks) - base) / R
    print(json.dumps({"component": "clip_fwd_b2", "ms": round(t * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
