"""Hardware A/B for the fused GN->SiLU->conv3x3 Pallas kernel (VERDICT r3 #4).

Two stages, per the int8 lesson (isolated wins DON'T transfer):
  1. isolated per-level: chained R-iteration loop of the res-block half
     (GN+SiLU+conv) at every SD-1.5 UNet level, XLA composition vs kernel.
  2. in-situ: whole-UNet CFG forward with apply_res_block routed through
     the fused kernel (both halves), vs shipping, chained.

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_conv_kernel.py [insitu|isolated]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models import unet
from pytorch_stable_diffusion_tpu.models.config import sd15_config
from pytorch_stable_diffusion_tpu.ops import conv as conv_op
from pytorch_stable_diffusion_tpu.ops import norm
from pytorch_stable_diffusion_tpu.ops.pallas import conv as pconv

R = 200  # per-level total must dwarf the ~30 ms fetch round-trip


def fetch(x):
    return float(jnp.ravel(x)[0])


_FETCH_S = None


def fetch_baseline():
    global _FETCH_S
    if _FETCH_S is None:
        z = jnp.zeros((1,), jnp.float32)
        fetch(z)
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            fetch(z)
            ts.append(time.perf_counter() - t0)
        _FETCH_S = float(np.median(ts))
        print(f"fetch baseline: {_FETCH_S*1e3:.2f} ms", flush=True)
    return _FETCH_S


def bench(fn, *args, iters=5):
    """Median wall seconds per call, fetch round-trip subtracted."""
    fetch(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - fetch_baseline(), 1e-9)


# SD-1.5 UNet levels at 512^2, CFG batch 2 and 8 (bench batch 4)
LEVELS = [
    (2, 64, 64, 320), (2, 32, 32, 640), (2, 16, 16, 1280), (2, 8, 8, 1280),
    (8, 64, 64, 320), (8, 16, 16, 1280),
]


def isolated():
    key = jax.random.PRNGKey(0)
    for (b, h, w, c) in LEVELS:
        if not pconv.eligible((b, h, w, c), (3, 3, c, c)):
            print(f"({b},{h}x{w},{c}): ineligible (C%128 DMA alignment) — "
                  f"falls back to XLA", flush=True)
            continue
        norm_p = {"scale": jnp.ones((c,), jnp.bfloat16),
                  "bias": jnp.zeros((c,), jnp.bfloat16)}
        conv_p = conv_op.init(jax.random.fold_in(key, 1), c, c, 3,
                              dtype=jnp.bfloat16)
        x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        gflop = 2 * b * h * w * c * c * 9 / 1e9

        @jax.jit
        def run_xla(p, cp, x0):
            def body(i, x):
                y = norm.group_norm_silu(p, x, 32, policy=BF16)
                return conv_op.apply(cp, y, padding=1, policy=BF16
                                     ).astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, x0)

        @jax.jit
        def run_pallas(p, cp, x0):
            def body(i, x):
                return pconv.gn_silu_conv3x3(p, cp, x, 32).astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, x0)

        want = jax.jit(lambda p, cp, x0: conv_op.apply(
            cp, norm.group_norm_silu(p, x0, 32, policy=BF16), padding=1,
            policy=BF16))(norm_p, conv_p, x)
        got = jax.jit(lambda p, cp, x0: pconv.gn_silu_conv3x3(
            p, cp, x0, 32))(norm_p, conv_p, x)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        t_x = bench(run_xla, norm_p, conv_p, x) / R
        t_p = bench(run_pallas, norm_p, conv_p, x) / R
        bg, bh, co = pconv._pick_blocks(b, h, w, c, c, 2)
        print(f"({b},{h}x{w},{c}): xla {t_x*1e6:7.1f} us ({gflop/t_x/1e3:6.1f}"
              f" TF/s) | pallas {t_p*1e6:7.1f} us ({gflop/t_p/1e3:6.1f} TF/s)"
              f"  blocks bg{bg} bh{bh} co{co}  delta {(t_p/t_x-1)*100:+.1f}%"
              f"  maxerr {err:.4f}", flush=True)


def insitu():
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    for b in (2, 8):
        lat = jax.random.normal(key, (b, 64, 64, 4), jnp.bfloat16)
        ctx = jax.random.normal(key, (b, 77, 768), jnp.bfloat16)
        for name, cb in (("shipping", "xla"), ("fused-conv", "pallas")):

            @jax.jit
            def chained(p, l, c, cb=cb):
                def body(i, x):
                    return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                      attention_backend="pallas",
                                      conv_backend=cb).astype(x.dtype)
                return jax.lax.fori_loop(0, 10, body, l)

            t = bench(chained, up, lat, ctx) / 10
            print(f"UNet fwd batch {b} [{name}]: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("isolated", "all"):
        isolated()
    if mode in ("insitu", "all"):
        insitu()
