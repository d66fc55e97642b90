"""A/B experiment: UNet forward under attention-block structure variants.

Trace findings this round: the five 4096-token flash calls run 1.09 ms
in-situ vs 0.95 ms standalone, and the residual adds around them lower to
layout-converting fusions ((2,4096,320) at {1,2,0} — S-minor) costing
~0.17 ms each.  Variants probe whether keeping the whole transformer block
in (B, S, C) form (1x1 convs expressed as matmuls, one reshape at each end)
gives XLA a consistent C-minor layout:

  baseline   — current apply_attn_block (reshape after conv_in / before conv_out)
  flat_block — GN + projections + residuals all in (B, HW, C); 1x1 convs as
               matmuls on the flattened sequence
  fused_qkv  — flat_block + self-attention q/k/v as ONE (C, 3C) matmul
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
    from pytorch_stable_diffusion_tpu.ops import attention, linear, norm
    from pytorch_stable_diffusion_tpu.ops.act import geglu
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (2, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)

    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    def mm(p, x, policy):
        """1x1-conv params applied as a matmul over the last dim of (B,S,C)."""
        k = p["kernel"][0, 0].astype(policy.compute_dtype)
        y = jnp.einsum("bsc,cd->bsd", x.astype(policy.compute_dtype), k,
                       preferred_element_type=policy.compute_dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y

    def flat_attn(p, x, context, n_heads, policy, fuse_qkv):
        q = linear.apply(p["q"], x, policy)
        if fuse_qkv and context is None:
            kw = jnp.concatenate([p["k"]["kernel"], p["v"]["kernel"]], axis=1)
            kv = jnp.einsum("bsc,cd->bsd", x.astype(policy.compute_dtype),
                            kw.astype(policy.compute_dtype),
                            preferred_element_type=policy.compute_dtype)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            src = x if context is None else context
            k = linear.apply(p["k"], src, policy)
            v = linear.apply(p["v"], src, policy)
        sh = attention._split_heads
        qh, kh, vh = sh(q, n_heads), sh(k, n_heads), sh(v, n_heads)
        if kh.shape[2] >= 256:
            o = flash_attention(qh, kh, vh, causal=False, policy=policy)
        else:
            o = attention._xla_attention(qh, kh, vh, False, policy)
        return linear.apply(p["out"], attention._merge_heads(o), policy)

    def make_flat_block(fuse_qkv):
        def apply_attn_block(p, x, context, n_heads, groups, policy, *,
                             backend="xla", reference_quirks=False):
            n, h, w, c = x.shape
            y0 = x.reshape(n, h * w, c)
            y = norm.group_norm(p["norm"], y0, groups, policy=policy)
            y = mm(p["conv_in"], y, policy)
            t = norm.layer_norm(p["ln1"], y, policy=policy)
            y = y + flat_attn(p["self_attn"], t, None, n_heads, policy, fuse_qkv)
            t = norm.layer_norm(p["ln2"], y, policy=policy)
            y = y + flat_attn(p["cross_attn"], t, context, n_heads, policy, False)
            t = norm.layer_norm(p["ln3"], y, policy=policy)
            t = geglu(linear.apply(p["geglu_proj"], t, policy), reference_quirks)
            y = y + linear.apply(p["geglu_out"], t, policy)
            y = mm(p["conv_out"], y, policy) + y0
            return y.reshape(n, h, w, c)
        return apply_attn_block

    orig = unet.apply_attn_block
    variants = [
        ("baseline", orig),
        ("flat_block", make_flat_block(False)),
        ("fused_qkv", make_flat_block(True)),
    ]
    ref = None
    for name, fn in variants:
        unet.apply_attn_block = fn

        @jax.jit
        def chained(p, l, c):
            def body(i, x):
                return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas").astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)

        t = (bench(chained, up, lat, ctx) - base) / R
        out = np.asarray(jnp.ravel(chained(up, lat, ctx))[:4], np.float32)
        rec = {"variant": name, "unet_fwd_ms": round(t * 1e3, 3),
               "out_head": [round(float(v), 4) for v in out]}
        if ref is None:
            ref = t
        else:
            rec["vs_baseline_pct"] = round(100 * (t - ref) / ref, 1)
        print(json.dumps(rec), flush=True)
    unet.apply_attn_block = orig


if __name__ == "__main__":
    main()
