"""In-situ A/B: whole SD-1.5 UNet forward with the dynamic w8a8 int8 path
(ops/quant.py) vs the shipping bf16 path — VERDICT r2 #2.

The round-2 standalone probe measured int8 matmuls at 2.4x/1.9x bf16 for
K=1280/2560 and 0.6x at K=320; this settles whether a *mixed* per-level
dispatch wins in situ:

  none  — shipping bf16 everywhere
  wide  — int8 only where K >= 1280 (the 16²/8² level matmuls/1x1s)
  conv  — additionally every 3x3 conv (effective K = 9C >= 2880)

Method per benchmarking lessons (CLAUDE.md): R iterations chained inside a
fori_loop with the output fed back, fetch-forced timing, fetch baseline
subtracted.  Also prints relative output error of the quantized paths vs
bf16 (random weights).
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


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    for b in (2, 8):
        lat = jax.random.normal(key, (b, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(key, (b, 77, 768), jnp.bfloat16)
        ref_t = ref_out = None
        for mode in ("none", "wide", "conv"):

            @jax.jit
            def chained(p, l, c, _mode=mode):
                def body(i, x):
                    return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                      attention_backend="pallas",
                                      quant=_mode).astype(x.dtype)
                return jax.lax.fori_loop(0, R, body, l)

            t = (bench(chained, up, lat, ctx) - base) / R

            @jax.jit
            def single(p, l, c, _mode=mode):
                return unet.apply(p, l, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas", quant=_mode)

            out = np.asarray(single(up, lat, ctx), np.float32)
            rec = {"cfg_batch": b, "quant": mode,
                   "unet_fwd_ms": round(t * 1e3, 3)}
            if ref_t is None:
                ref_t, ref_out = t, out
            else:
                rec["vs_bf16_pct"] = round(100 * (t - ref_t) / ref_t, 1)
                rec["rel_err"] = round(float(
                    np.abs(out - ref_out).mean()
                    / (np.abs(ref_out).mean() + 1e-9)), 4)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
