"""Flash attention (Pallas, TPU).

Blockwise softmax-rescaled attention — O(S) memory instead of the reference's
materialized (S, S) score matrices (``/root/reference/sd/attention.py:55-76``).
At SD's 64²=4096-token spatial stage the score tensor is 4096²×8 heads×2
(CFG) ≈ 1 GB of HBM traffic per UNet block in fp32; this kernel keeps scores
in VMEM and streams K/V once.

Numerics: scores and the softmax accumulator are fp32 (policy.softmax_dtype)
regardless of the bf16 compute path.  Scale is 1/sqrt(Dh), applied to logits
before softmax — equivalent to the reference's mask-then-scale order.

Grid: (B*H, Sq/block_q, Sk/block_k), kv innermost; m/l/acc persist in VMEM
scratch across the sequential kv steps (TPU grids execute in order).

Numerical edge, guarded: while the running max is still NEG_INF (every
score seen so far masked), ``exp(s - m_new)`` evaluates masked entries at
exp(0)=1, temporarily accumulating garbage V rows.  A later unmasked block
self-heals (alpha = exp(NEG_INF - m_real) = 0 rescales the poison away),
but a q-row masked in EVERY block would output the mean of masked V instead
of 0 — so ``_online_update`` zeroes p where s is masked (and the one-pass
kernel gets the same guard).  Unreachable through today's public callers
(causal rows include col 0; KV padding never fills a whole row), but the
guard keeps a future mask kind — sliding windows, prefix masks — from
silently averaging garbage; regression-tested in tests/test_flash_edge.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.dtypes import Policy, FP32

NEG_INF = -1e30
#: exp(x) == exp2(x * LOG2E); the kernels fold LOG2E into the 1/sqrt(Dh)
#: logit scale so the (cheaper) hardware exp2 replaces exp with no extra
#: full-block multiply.
LOG2E = 1.4426950408889634


def _online_update(s, m_prev, l_prev, acc_prev, v, v_dtype,
                   masked: bool = True, exp=jnp.exp):
    """One online-softmax step over a (block_q, block_k) score block.

    Pure jnp — traced inline by the kernel, unit-testable outside it
    (tests/test_flash_edge.py).  Returns (m_new, l_new, acc_new), fp32.

    ``masked=False`` (statically known: no causal mask, no kv-tail padding)
    skips the masked-row guard — a full-block compare+select that costs real
    VPU time at SD's 4096-token blocks.  ``exp`` is jnp.exp2 when the caller
    pre-scaled the logits by LOG2E.
    """
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = exp(s - m_new)  # (block_q, block_k) f32
    if masked:
        # Masked-row guard: while m_new is still NEG_INF (nothing unmasked
        # seen yet), exp(s - m_new) == 1 for masked entries; zero them so a
        # q-row masked in every block yields 0, not the mean of masked V.
        p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
    alpha = exp(m_prev - m_new)  # (block_q, 1)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, Dh)
    return m_new, l_new, acc_prev * alpha + pv


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, scale: float, kv_len: int, block_k: int, causal: bool,
            block_q: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, Dh)
    k = k_ref[0]  # (block_k, Dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)  # (block_q, block_k), log2-space logits

    masked = causal or kv_len % block_k != 0
    if kv_len % block_k != 0:
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    if causal:
        qi = pl.program_id(1)
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        s = jnp.where(col <= row, s, NEG_INF)

    m_new, l_new, acc_new = _online_update(
        s, m_ref[:, :1], l_ref[:, :1], acc_ref[:], v_ref[0], v_ref.dtype,
        masked=masked, exp=jnp.exp2)
    acc_ref[:] = acc_new
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _out():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] * jnp.reciprocal(jnp.maximum(l, 1e-30))).astype(o_ref.dtype)


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                    causal: bool, block_q: int):
    """Single KV block covers the whole sequence: plain (still numerically
    safe) softmax per q block, no cross-step scratch.  This is the common
    case for SD's spatial attention (Sk <= 4096) and avoids the online
    rescaling work of the multi-pass kernel."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)  # log2-space logits: exp2 below == exp of s*scale
    masked = causal or kv_len != s.shape[-1]
    if kv_len != s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    if causal:
        qi = pl.program_id(1)
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col <= row, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    if masked:
        # same masked-row guard as _online_update (a fully-masked q-row would
        # otherwise output the mean of masked V rows); skipped when masking
        # is statically impossible — it is a full-block compare+select.
        p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (pv * jnp.reciprocal(jnp.maximum(l, 1e-30))).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


#: VMEM budget for the one-pass scores block (block_q x Sk_pad x 4B).
#: 8 MB leaves room for q/k/v/out blocks and double buffering in ~16 MB VMEM.
ONE_PASS_SCORE_BYTES = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("causal", "policy", "block_q", "block_k"))
def flash_attention(q, k, v, *, causal: bool = False, policy: Policy = FP32,
                    block_q: int = None, block_k: int = None):
    """q: (B, H, Sq, Dh); k,v: (B, H, Sk, Dh) -> (B, H, Sq, Dh)."""
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    scale = 1.0 / (dh**0.5)

    sk_padded = -(-max(sk, 128) // 128) * 128
    if block_q is None:
        # Swept on v5e (benchmarks/flash_tune.py): 256 wins at 4096 tokens;
        # 512 wins by ~4x at 1024 tokens (fewer, fatter grid cells).  For
        # very long KV, shrink block_q until one pass fits the VMEM budget
        # (768² -> Sk 9216 -> block_q 128: 4.7 MB scores, still one pass).
        block_q = 256 if sq > 2048 else 512
        while block_q > 128 and block_q * sk_padded * 4 > ONE_PASS_SCORE_BYTES:
            block_q //= 2
    block_q = min(block_q, max(8, sq))
    if block_k is None:
        one_pass_ok = block_q * sk_padded * 4 <= ONE_PASS_SCORE_BYTES
        block_k = sk_padded if one_pass_ok else 2048
    block_k = min(block_k, max(128, sk))
    if causal and block_q != block_k:
        block_k = block_q = min(block_q, block_k)

    qp = _pad_to(q.reshape(b * h, sq, dh), 1, block_q)
    kp = _pad_to(k.reshape(b * h, sk, dh), 1, block_k)
    vp = _pad_to(v.reshape(b * h, sk, dh), 1, block_k)
    sq_p, sk_p = qp.shape[1], kp.shape[1]
    nq, nk = sq_p // block_q, sk_p // block_k

    # Interpreter mode off-TPU so the CPU test mesh (conftest) still runs.
    interpret = jax.default_backend() != "tpu"
    q_spec = pl.BlockSpec((1, block_q, dh), lambda bh, qi, *_: (bh, qi, 0),
                          memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * h, sq_p, dh), q.dtype)

    if nk == 1:
        kv_spec = pl.BlockSpec((1, sk_p, dh), lambda bh, qi: (bh, 0, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_onepass_kernel, scale=scale, kv_len=sk,
                              causal=causal, block_q=block_q),
            grid=(b * h, nq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :sq].reshape(b, h, sq, dh)

    kv_spec = pl.BlockSpec((1, block_k, dh), lambda bh, qi, ki: (bh, ki, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, kv_len=sk, block_k=block_k,
            causal=causal, block_q=block_q,
        ),
        grid=(b * h, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max m
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denom l
            pltpu.VMEM((block_q, dh), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq].reshape(b, h, sq, dh)
