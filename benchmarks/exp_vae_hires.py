"""Hi-res whole VAE decode: XLA vs flash attention (round 3).

The 1-head VAE mid-block attention over H/8·W/8 tokens materializes an
(S, S) fp32 score tensor on the XLA path: 1 GB at 1024², 5.4 GB at 1536²,
17 GB at 2048² — the last does not even compile.  Findings (RESULTS.md):

  * 1536² whole decode works at 255.5 ms (xla) — 1.6× faster than the
    tiled path round 2 prescribed for it.
  * 2048² whole decode runs ONLY through flash (459.5 ms); attention
    ≥40960 tokens now auto-escapes to flash in ops/attention.py.
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


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(fn, *a, iters=3):
    fetch(fn(*a))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import vae
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    dp = vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae,
                          dtype=jnp.bfloat16)
    for size in (1024, 1536, 2048):
        lat = jax.random.normal(key, (1, size // 8, size // 8, 4),
                                jnp.float32)
        for backend in ("xla", "pallas"):
            try:
                @jax.jit
                def dec(p, l, _b=backend):
                    return vae.apply_decoder(p, l, cfg.vae, cfg.policy,
                                             attention_backend=_b)
                t = bench(dec, dp, lat)
                print(json.dumps({"size": size, "attn": backend,
                                  "decode_ms": round(t * 1e3, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001 - xla 2048² cannot compile
                print(json.dumps({"size": size, "attn": backend,
                                  "error": str(e)[:110]}), flush=True)


if __name__ == "__main__":
    main()
