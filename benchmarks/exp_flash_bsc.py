"""Experiment: flash attention directly on (B, S, H*D) — no head transposes.

The shipping path does (B,S,C) -> split_heads transpose -> (BH,S,D) kernel
-> merge transpose -> (B,S,C).  The transposes lower to real HBM copies
(~0.17 ms each at batch 8, x4 per attention block — 3.6 ms/fwd total in the
batch-8 trace).  This kernel reads contiguous (block_q, H*D) blocks and
slices each head's 40 lanes in VMEM; heads are chained with a false data
dependency so only one head's chunk score blocks are live at a time.

Measured comparison: chained loop of [split -> kernel -> merge] vs the BSC
kernel, both (B,S,C)->(B,S,C).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _bsc_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_heads: int,
                chunk: int):
    sk = k_ref.shape[1]
    dh = q_ref.shape[2] // n_heads
    n_chunks = sk // chunk
    q_all = q_ref[0]  # (bq, H*D)
    marker = jnp.float32(0.0)
    for h in range(n_heads):
        q = q_all[:, h * dh:(h + 1) * dh]
        # false dependency on the previous head bounds live score blocks
        q = q + marker.astype(q.dtype)
        ms, ls, pvs = [], [], []
        for c in range(n_chunks):
            k = k_ref[0, c * chunk:(c + 1) * chunk, h * dh:(h + 1) * dh]
            v = v_ref[0, c * chunk:(c + 1) * chunk, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            ms.append(m)
            ls.append(jnp.sum(p, axis=-1, keepdims=True))
            pvs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        if n_chunks == 1:
            l, pv = ls[0], pvs[0]
        else:
            m_all = functools.reduce(jnp.maximum, ms)
            ws = [jnp.exp2(m - m_all) for m in ms]
            l = sum(lc * w for lc, w in zip(ls, ws))
            pv = sum(pvc * w for pvc, w in zip(pvs, ws))
        out = pv * jnp.reciprocal(jnp.maximum(l, 1e-30))
        o_ref[0, :, h * dh:(h + 1) * dh] = out.astype(o_ref.dtype)
        marker = jnp.sum(l) * 0.0


def bsc_flash(q, k, v, *, n_heads: int, block_q=256, chunk=512):
    b, sq, c = q.shape
    sk = k.shape[1]
    dh = c // n_heads
    scale = 1.0 / (dh**0.5)
    nq = sq // block_q
    q_spec = pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, sk, c), lambda bi, qi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bsc_kernel, scale=scale, n_heads=n_heads,
                          chunk=chunk),
        grid=(b, nq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v)


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
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    H, D = 8, 40
    R = 20
    for b, s in ((8, 4096), (2, 4096)):
        c = H * D
        q = jax.random.normal(jax.random.fold_in(key, 1), (b, s, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 2), (b, s, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 3), (b, s, c), jnp.bfloat16)

        def shipping(q, k, v):
            def sh(x):
                return x.reshape(b, s, H, D).transpose(0, 2, 1, 3)
            o = flash_attention(sh(q), sh(k), sh(v))
            return o.transpose(0, 2, 1, 3).reshape(b, s, c)

        got = np.asarray(bsc_flash(q, k, v, n_heads=H), np.float32)
        ref = np.asarray(shipping(q, k, v), np.float32)
        err = float(np.max(np.abs(got - ref)))

        flops = 2 * 2 * b * H * s * s * D
        for name, fn in (("shipping+transposes", shipping),
                         ("bsc_bq256_c512", functools.partial(
                             bsc_flash, n_heads=H, block_q=256, chunk=512)),
                         ("bsc_bq128_c512", functools.partial(
                             bsc_flash, n_heads=H, block_q=128, chunk=512)),
                         ("bsc_bq256_c1024", functools.partial(
                             bsc_flash, n_heads=H, block_q=256, chunk=1024))):
            @jax.jit
            def chain(q, k, v, fn=fn):
                def body(i, carry):
                    return fn(carry, k, v).astype(carry.dtype)
                return jax.lax.fori_loop(0, R, body, q)

            t = (bench(chain, q, k, v) - base) / R
            print(json.dumps({"b": b, "variant": name,
                              "ms": round(t * 1e3, 3),
                              "tflops": round(flops / t / 1e12, 1),
                              "max_err": round(err, 5)}), flush=True)


if __name__ == "__main__":
    main()
