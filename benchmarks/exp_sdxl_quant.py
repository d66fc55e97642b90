"""In-situ A/B: whole SDXL UNet forward, dynamic w8a8 int8 (quant="wide")
vs the shipping bf16 path.

SD-1.5 measured int8 NEGATIVE in situ (+67%: quant boundaries fragment
XLA's fusions — RESULTS.md).  SDXL's profile is different — the 64²/32²
levels are d=640/1280 with 5120-wide FFs, so a far larger share of time is
in K>=1280 contractions where the isolated probe measured int8 ~2x.  This
settles whether the negative result transfers.

Method per CLAUDE.md benchmarking lessons: R chained iterations inside a
fori_loop (output fed back), fetch-forced timing, fetch baseline
subtracted; relative output error vs bf16 reported.
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
    from pytorch_stable_diffusion_tpu.models.config import sdxl_config

    enable_compilation_cache()
    cfg = sdxl_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    b = 2  # CFG batch for one 1024² image
    lat = jax.random.normal(key, (b, 128, 128, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (b, 77, cfg.unet.d_context), jnp.bfloat16)
    add = jax.random.normal(key, (b, cfg.unet.add_embed_dim), jnp.bfloat16)
    ref_t = ref_out = None
    for mode in ("none", "wide"):

        @jax.jit
        def chained(p, l, c, a, _mode=mode):
            def body(i, x):
                return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas", add_cond=a,
                                  quant=_mode).astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)

        t = (bench(chained, up, lat, ctx, add) - base) / R

        @jax.jit
        def single(p, l, c, a, _mode=mode):
            return unet.apply(p, l, c, 981, cfg.unet, cfg.policy,
                              attention_backend="pallas", add_cond=a,
                              quant=_mode)

        out = np.asarray(single(up, lat, ctx, add), np.float32)
        rec = {"quant": mode, "unet_fwd_ms": round(t * 1e3, 3)}
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
