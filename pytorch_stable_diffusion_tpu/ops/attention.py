"""Multi-head attention (self + cross), two backends.

Reference semantics (``/root/reference/sd/attention.py``):
  * SelfAttention: fused in_proj in the reference; we keep q/k/v separate
    (CompVis ckpt stores them separately; JAX/XLA gains nothing from fusing,
    SURVEY §7.5) — converter handles both layouts.
  * scores = q @ k^T, optional causal mask to -inf, then scale by
    1/sqrt(d_head), softmax, @v  (``attention.py:55-76``).  Masking before
    vs after scaling is mathematically identical (-inf is scale-invariant,
    unmasked logits are untouched), so both backends scale first.
  * CrossAttention: kv from a 77-token context; the reference attends to
    tokenizer padding with NO mask (``attention.py:219-229``) — we likewise
    pass no padding mask (parity requirement, SURVEY §7 "hard parts").

Backends:
  * "xla":    einsum attention, scores materialized; used for parity tests
              and tiny sequences (CLIP's 77 tokens).
  * "pallas": flash attention (ops/pallas/flash_attention.py) — blockwise,
              O(S) memory; the production path for the 4096/9216-token
              spatial sequences of the UNet and VAE mid-blocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from . import linear


def init(key, n_heads: int, d_embed: int, d_cross: Optional[int] = None,
         in_bias: bool = True, out_bias: bool = True, dtype=jnp.float32):
    """Cross-attention when d_cross is given; self-attention otherwise.

    UNet blocks use in_bias=False, out_bias=True (``sd/diffusion.py:259,262``);
    CLIP and the VAE use biases everywhere.
    """
    d_kv = d_cross if d_cross is not None else d_embed
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": linear.init(kq, d_embed, d_embed, bias=in_bias, dtype=dtype),
        "k": linear.init(kk, d_kv, d_embed, bias=in_bias, dtype=dtype),
        "v": linear.init(kv, d_kv, d_embed, bias=in_bias, dtype=dtype),
        "out": linear.init(ko, d_embed, d_embed, bias=out_bias, dtype=dtype),
    }


def _split_heads(x, n_heads):
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def _xla_attention(q, k, v, causal: bool, policy: Policy,
                   return_probs: bool = False):
    """q,k,v: (B, H, S, Dh).  Softmax in policy.softmax_dtype."""
    dh = q.shape[-1]
    scale = 1.0 / (dh**0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=policy.softmax_dtype) * scale
    if causal:
        sq, sk = scores.shape[-2:]
        mask = jnp.tril(jnp.ones((sq, sk), bool))
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores.astype(policy.softmax_dtype), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                     preferred_element_type=policy.compute_dtype)
    if return_probs:
        return out.astype(q.dtype), probs
    return out.astype(q.dtype)


def _fused_proj(parts, x, policy: Policy, quant: str = "none"):
    """Apply several same-input linears as ONE matmul (kernels concatenated
    on the out-dim), then split.  Measured on v5e: fusing self-attention
    q/k/v cuts the whole SD UNet forward ~5% vs three N=320 matmuls — the
    MXU tiles the wider N far better (benchmarks/exp_attn_variants.py).
    The concatenations are loop-invariant (params) and hoisted by XLA —
    as is the int8 weight quantization on the quant path."""
    kern = jnp.concatenate([p["kernel"] for p in parts], axis=1)
    bias = (jnp.concatenate([p["bias"] for p in parts])
            if "bias" in parts[0] else None)
    if quant != "none":
        from . import quant as quant_mod

        if quant_mod.matmul_wants_int8(quant, kern.shape[0]):
            y = quant_mod.int8_linear(x, kern, bias).astype(policy.compute_dtype)
            return jnp.split(y, len(parts), axis=-1)
    y = jnp.dot(x.astype(policy.compute_dtype), kern.astype(policy.compute_dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return jnp.split(y, len(parts), axis=-1)


def _sp_self_attention(q, k, v, n_heads: int, backend: str, policy: Policy,
                       sp_mesh):
    """Sequence-parallel self-attention core (parallel/sp.py): tokens are
    sharded over the mesh's 'model' axis; each shard all-gathers K/V over
    ICI and runs the regular per-shard kernel (flash included — a pallas
    custom call GSPMD itself cannot partition, which is why this is a
    shard_map and not a sharding constraint) on its local q rows.
    """
    from jax.sharding import PartitionSpec as P

    def local(ql, kl, vl):
        kf = jax.lax.all_gather(kl, "model", axis=1, tiled=True)
        vf = jax.lax.all_gather(vl, "model", axis=1, tiled=True)
        qh, kh, vh = (_split_heads(t, n_heads) for t in (ql, kf, vf))
        if backend == "pallas" and kh.shape[2] >= 256:
            from .pallas.flash_attention import flash_attention

            out = flash_attention(qh, kh, vh, policy=policy)
        else:
            out = _xla_attention(qh, kh, vh, False, policy)
        return _merge_heads(out)

    # DP x SP composes: keep the batch sharded over 'data' inside the
    # shard_map too (otherwise jax would gather the batch and compute it
    # redundantly per data-group)
    bspec = "data" if sp_mesh.shape.get("data", 1) > 1 else None
    spec = P(bspec, "model", None)
    return jax.shard_map(local, mesh=sp_mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def apply_identity(params, x, *, policy: Policy = FP32, quant: str = "none"):
    """Self-attention with the attention map replaced by the identity
    matrix: every token attends only to itself, so the output collapses to
    ``out_proj(v_proj(x))`` — no scores, no softmax.  This is the
    perturbed branch of Perturbed-Attention Guidance (Ahn et al. 2024,
    diffusers' PAGIdentitySelfAttnProcessor); q/k projections are skipped
    entirely (their output would be discarded)."""
    v = linear.apply(params["v"], x, policy, quant)
    return linear.apply(params["out"], v, policy, quant)


def apply(params, x, context=None, *, n_heads: int, causal: bool = False,
          backend: str = "xla", policy: Policy = FP32, fuse: bool = True,
          quant: str = "none", sp_mesh=None, return_probs: bool = False,
          ip=None):
    """x: (B, S, D); context: (B, S_kv, D_cross) for cross-attention.

    ``fuse=False`` applies q/k/v as separate linears instead of the fused
    wide matmul.  Use under tensor parallelism: the fused concatenation runs
    along the Megatron column-sharded kernel axis, forcing GSPMD to gather
    the deliberately-sharded weights and un-split the projection compute
    (ADVICE r2); the pipeline sets this automatically from the mesh.

    ``sp_mesh``: sequence-parallel mode — self-attention runs q-sharded
    via shard_map with gathered K/V (see _sp_self_attention); projections
    and cross-attention stay GSPMD-partitioned.

    ``ip``: IP-Adapter decoupled cross-attention (Ye et al. 2023) — a
    ``(ip_params, ip_tokens, ip_scale)`` tuple: a second attention over
    the few image-prompt tokens with dedicated bias-free k/v projections
    sharing THIS layer's query heads, added scale-weighted to the text
    attention output BEFORE out_proj (the IPAttnProcessor contract).
    Cross-attention only.
    """
    if context is None:  # self-attention: one fused qkv matmul
        if fuse:
            q, k, v = _fused_proj((params["q"], params["k"], params["v"]), x,
                                  policy, quant)
        else:
            q = linear.apply(params["q"], x, policy, quant)
            k = linear.apply(params["k"], x, policy, quant)
            v = linear.apply(params["v"], x, policy, quant)
        if sp_mesh is not None and not causal and not return_probs:
            out = _sp_self_attention(q, k, v, n_heads, backend, policy,
                                     sp_mesh)
            return linear.apply(params["out"], out, policy, quant)
        # BSC kernel: heads stay packed in lanes, no (B,S,H,D)<->(B,H,S,D)
        # transposes around the custom call (-3.3% whole-UNet at CFG batch 8;
        # benchmarks/exp_bsc_insitu.py).  Falls through when the whole-C KV
        # exceeds the kernel's VMEM model (e.g. 9216 tokens at 768²).
        if backend == "pallas" and not causal and not return_probs:
            from .pallas.flash_attention import bsc_fits, flash_attention_bsc

            # quant graphs shift Mosaic's scoped-vmem stack enough to push
            # CFG batch 8 over the 16 MB cliff (measured +136K overflow,
            # round 3) — halve the admitted batch there
            eff_batch = q.shape[0] * (2 if quant != "none" else 1)
            if bsc_fits(q.shape[1], k.shape[1], k.shape[2],
                        jnp.dtype(k.dtype).itemsize, batch=eff_batch):
                out = flash_attention_bsc(q, k, v, n_heads=n_heads)
                return linear.apply(params["out"], out, policy, quant)
    else:  # cross-attention: k/v share the context input — except under a
        # hypernetwork, which feeds k and v DIFFERENT context transforms
        # (A1111 semantics; context arrives as a (ctx_k, ctx_v) tuple)
        ctx_k, ctx_v = context if isinstance(context, tuple) \
            else (context, context)
        q = linear.apply(params["q"], x, policy, quant)
        if fuse and ctx_k is ctx_v:
            k, v = _fused_proj((params["k"], params["v"]), ctx_k, policy,
                               quant)
        else:
            k = linear.apply(params["k"], ctx_k, policy, quant)
            v = linear.apply(params["v"], ctx_v, policy, quant)
    qh, kh, vh = (_split_heads(t, n_heads) for t in (q, k, v))
    # Flash pays off for long KV (it exists to keep O(S²) scores in VMEM);
    # for short KV (cross-attention over 77 context tokens) the grid's tiny
    # per-cell matmuls lose to one batched XLA matmul.  Past ~40k tokens
    # the XLA path's materialized scores stop COMPILING at all (65536² f32
    # = 17 GB — measured: whole 2048² VAE decode fails on xla, runs on
    # flash at 459 ms), so extreme sequences escape to flash regardless of
    # the configured backend.
    if return_probs:
        # SAG's attention-map capture: materialized scores, XLA path only
        # (used at the mid block, whose sequence is tiny)
        out, probs = _xla_attention(qh, kh, vh, causal, policy,
                                    return_probs=True)
        return linear.apply(params["out"], _merge_heads(out), policy,
                            quant), probs
    if (backend == "pallas" and kh.shape[2] >= 256) or kh.shape[2] >= 40960:
        from .pallas.flash_attention import flash_attention

        out = flash_attention(qh, kh, vh, causal=causal, policy=policy)
    else:
        out = _xla_attention(qh, kh, vh, causal, policy)
    if ip is not None:
        # decoupled image-token attention: a handful of KV tokens — the
        # materialized-scores path is the right kernel regardless of backend
        ipp, ip_tokens, ip_scale = ip
        k_ip = linear.apply(ipp["k"], ip_tokens, policy, quant)
        v_ip = linear.apply(ipp["v"], ip_tokens, policy, quant)
        out_ip = _xla_attention(qh, _split_heads(k_ip, n_heads),
                                _split_heads(v_ip, n_heads), False, policy)
        out = out + ip_scale.astype(out.dtype) * out_ip
    return linear.apply(params["out"], _merge_heads(out), policy, quant)
