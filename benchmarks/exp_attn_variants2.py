"""Follow-up A/B: isolate the -5.5% from exp_attn_variants.py.

Production now fuses q/k/v 3-way inside ops.attention.apply, but on the
conv-form block it measured ~20.7 ms (no gain).  The original winner was
flat_block + 2-way (k,v) fusion with q separate.  Variants here (all on top
of the CURRENT production attention.apply unless noted):

  conv_3way   — production as-is (control)
  flat_3way   — flat (B,S,C) block calling production attention.apply
  flat_2way   — flat block, q separate + k/v fused (the original winner)
  conv_2way   — conv-form block, q separate + k/v fused
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

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (2, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)

    base = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)))
    print(json.dumps({"fetch_baseline_ms": round(base * 1e3, 2)}), flush=True)

    def mm(p, x, policy):
        k = p["kernel"][0, 0].astype(policy.compute_dtype)
        y = jnp.einsum("bsc,cd->bsd", x.astype(policy.compute_dtype), k,
                       preferred_element_type=policy.compute_dtype)
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y

    def attn_2way(p, x, context, n_heads, policy):
        q = linear.apply(p["q"], x, policy)
        src = x if context is None else context
        k, v = attention._fused_proj((p["k"], p["v"]), src, policy)
        sh = attention._split_heads
        qh, kh, vh = sh(q, n_heads), sh(k, n_heads), sh(v, n_heads)
        if kh.shape[2] >= 256:
            from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import \
                flash_attention
            o = flash_attention(qh, kh, vh, causal=False, policy=policy)
        else:
            o = attention._xla_attention(qh, kh, vh, False, policy)
        return linear.apply(p["out"], attention._merge_heads(o), policy)

    def make_block(flat, two_way):
        def flat_block(p, x, context, n_heads, groups, policy, *,
                       backend="xla", reference_quirks=False):
            n, h, w, c = x.shape
            y0 = x.reshape(n, h * w, c)
            y = norm.group_norm(p["norm"], y0, groups, policy=policy)
            y = mm(p["conv_in"], y, policy)
            t = norm.layer_norm(p["ln1"], y, policy=policy)
            if two_way:
                y = y + attn_2way(p["self_attn"], t, None, n_heads, policy)
            else:
                y = y + attention.apply(p["self_attn"], t, n_heads=n_heads,
                                        backend=backend, policy=policy)
            t = norm.layer_norm(p["ln2"], y, policy=policy)
            y = y + attention.apply(p["cross_attn"], t, context,
                                    n_heads=n_heads, backend=backend,
                                    policy=policy)
            t = norm.layer_norm(p["ln3"], y, policy=policy)
            t = geglu(linear.apply(p["geglu_proj"], t, policy), reference_quirks)
            y = y + linear.apply(p["geglu_out"], t, policy)
            y = mm(p["conv_out"], y, policy) + y0
            return y.reshape(n, h, w, c)

        def conv_block_2way(p, x, context, n_heads, groups, policy, *,
                            backend="xla", reference_quirks=False):
            from pytorch_stable_diffusion_tpu.ops import conv
            n, h, w, c = x.shape
            res_long = x
            y = norm.group_norm_silu(p["norm"], x, groups, policy=policy,
                                     backend=backend, apply_silu=False)
            y = conv.apply(p["conv_in"], y, policy=policy)
            y = y.reshape(n, h * w, c)
            t = norm.layer_norm(p["ln1"], y, policy=policy)
            y = y + attn_2way(p["self_attn"], t, None, n_heads, policy)
            t = norm.layer_norm(p["ln2"], y, policy=policy)
            y = y + attention.apply(p["cross_attn"], t, context,
                                    n_heads=n_heads, backend=backend,
                                    policy=policy)
            t = norm.layer_norm(p["ln3"], y, policy=policy)
            t = geglu(linear.apply(p["geglu_proj"], t, policy), reference_quirks)
            y = y + linear.apply(p["geglu_out"], t, policy)
            y = y.reshape(n, h, w, c)
            return conv.apply(p["conv_out"], y, policy=policy) + res_long

        return flat_block if flat else conv_block_2way

    orig = unet.apply_attn_block
    variants = [
        ("conv_3way(prod)", orig),
        ("flat_3way", make_block(True, False)),
        ("flat_2way", make_block(True, True)),
        ("conv_2way", make_block(False, True)),
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
        rec = {"variant": name, "unet_fwd_ms": round(t * 1e3, 3)}
        if ref is None:
            ref = t
        else:
            rec["vs_prod_pct"] = round(100 * (t - ref) / ref, 1)
        print(json.dumps(rec), flush=True)
    unet.apply_attn_block = orig


if __name__ == "__main__":
    main()
