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


def _chunk_softmax_stats(q, k_ref, v_ref, *, scale: float, kv_len: int,
                         base: int, last_base: int, chunk: int, n_chunks: int,
                         causal: bool, block_q: int, row_block):
    """Per-chunk (m, l, pv) over ``n_chunks`` INDEPENDENT KV chunks starting
    at ref offset 0 / absolute KV position ``base``, merged closed-form.

    Shared by the one-pass and multi-pass kernels: the chunks carry no
    cross-chunk data dependence, so the Mosaic scheduler overlaps chunk
    c+1's MXU matmuls with chunk c's VPU exp — the serial QK -> exp -> PV
    chain measured 45 vs 62 TFLOP/s at the SD 4096-token shape
    (benchmarks/exp_flash_chunked.py).  Returns fp32 (m, l, pv) for the
    whole (block_q, n_chunks*chunk) span.  ``base`` may be traced
    (multi-pass grid step); ``last_base`` is the STATIC base of the final
    grid step (0 for one-pass), bounding which chunks can ever cross the
    kv tail; ``row_block`` is the q-row block index for causal masking.
    """
    ms, ls, pvs = [], [], []
    for c in range(n_chunks):
        k = k_ref[0, c * chunk:(c + 1) * chunk]
        v = v_ref[0, c * chunk:(c + 1) * chunk]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)  # log2-space logits: exp2 == exp of s*scale
        # tail masking: statically skipped for chunks that cannot cross
        # kv_len even in the final grid step (earlier steps' col < kv_len
        # comparisons would be vacuously true anyway)
        tail_possible = last_base + (c + 1) * chunk > kv_len
        masked = causal or tail_possible
        if tail_possible:
            col = base + c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        if causal:
            row = row_block * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            col = base + c * chunk + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1)
            s = jnp.where(col <= row, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        if masked:
            # masked-row guard (see module docstring): a fully-masked q-row
            # must yield l=0/pv=0, not the mean of masked V rows.  Skipped
            # when masking is statically impossible — it is a full-chunk
            # compare+select.
            p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
        ms.append(m)
        ls.append(jnp.sum(p, axis=-1, keepdims=True))
        pvs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    if n_chunks == 1:
        return ms[0], ls[0], pvs[0]
    m_all = functools.reduce(jnp.maximum, ms)
    # fully-masked rows: every m_c == NEG_INF -> weights 2^0 = 1, but all
    # l_c/pv_c are 0 (guard above), so the row still outputs 0
    ws = [jnp.exp2(m - m_all) for m in ms]
    l = sum(lc * w for lc, w in zip(ls, ws))
    pv = sum(pvc * w for pvc, w in zip(pvs, ws))
    return m_all, l, pv


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, scale: float, kv_len: int, block_k: int, causal: bool,
            block_q: int, chunk: int, n_kv_steps: int):
    """Multi-pass grid cell: running (m, l, acc) scratch across sequential
    kv steps, each step's block_k processed as independent chunks (round 3:
    the serial QK->exp->PV chain previously left the MXU idle here — the
    exact penalty the one-pass chunked kernel was built to remove; long-KV
    shapes like 1024² = 16384 tokens only have this path)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (block_q, Dh)
    m_blk, l_blk, pv_blk = _chunk_softmax_stats(
        q, k_ref, v_ref, scale=scale, kv_len=kv_len, base=ki * block_k,
        last_base=(n_kv_steps - 1) * block_k, chunk=chunk,
        n_chunks=block_k // chunk, causal=causal,
        block_q=block_q, row_block=pl.program_id(1))

    # merge the block's stats into the running scratch (standard flash
    # rescaling, operating on pre-reduced (m, l, pv) instead of raw scores)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, m_blk)
    alpha = jnp.exp2(m_prev - m_new)
    beta = jnp.exp2(m_blk - m_new)
    l_new = alpha * l_prev + beta * l_blk
    acc_ref[:] = acc_ref[:] * alpha + pv_blk * beta
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nk - 1)
    def _out():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] * jnp.reciprocal(jnp.maximum(l, 1e-30))).astype(o_ref.dtype)


def _onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int,
                    causal: bool, block_q: int, chunk: int):
    """Whole-KV grid cell, processed as INDEPENDENT chunks merged at the end.

    The serial chain QK^T (MXU) -> max/exp/sum (VPU) -> PV (MXU) leaves the
    MXU idle during the vector work; measured 45 TFLOP/s — exactly the
    zero-overlap prediction at head_dim 40.  Splitting KV into chunks with
    per-chunk max/denominator/accumulator and a closed-form merge removes
    the cross-chunk data dependence, so the scheduler overlaps chunk c+1's
    matmuls with chunk c's exp: 0.93 -> 0.69 ms on the SD 4096-token shape,
    62 TFLOP/s = the head_dim-40 MXU ceiling (benchmarks/exp_flash_chunked.py).
    Merge is the standard flash rescaling, exact up to fp ordering:
      m = max_c m_c;  l = sum_c l_c 2^(m_c - m);  acc = sum_c pv_c 2^(m_c - m).
    """
    q = q_ref[0]
    sk_p = k_ref.shape[1]
    _, l, pv = _chunk_softmax_stats(
        q, k_ref, v_ref, scale=scale, kv_len=kv_len, base=0, last_base=0,
        chunk=chunk, n_chunks=sk_p // chunk, causal=causal, block_q=block_q,
        row_block=pl.program_id(1))
    o_ref[0] = (pv * jnp.reciprocal(jnp.maximum(l, 1e-30))).astype(o_ref.dtype)


def _streamed_kernel(q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, ksem, vsem, *,
                     scale: float, kv_len: int, group: int, chunk: int,
                     n_groups: int, block_q: int):
    """Long-KV one-pass kernel with MANUAL double-buffered KV streaming.

    The multi-pass grid serializes at every kv step: Mosaic pipelines block
    DMAs across grid iterations but not compute, so each step's closed-form
    merge stalls the MXU (measured 44-50 TFLOP/s at 16384 tokens vs the
    one-pass kernel's 62 at 4096).  Here the whole KV walk happens inside
    ONE grid cell: groups of ``group`` tokens are DMA'd HBM->VMEM into a
    2-slot double buffer (guide pattern) while the current group's
    dependence-free chunks run, and the group merge is ordinary in-kernel
    dataflow the scheduler can overlap with the next group's matmuls.
    Score liveness is bounded by one group (block_q x group x 4B), not the
    whole KV — the reason 16384 tokens cannot use the plain one-pass path.

    Non-causal only (the UNet/VAE spatial case; causal long-KV keeps the
    multi-pass grid).

    K and V arrive TRANSPOSED, (BH, Dh, Sk): Mosaic requires DMA slices to
    be 128-lane-aligned on the minor dim, which head_dim 40 is not — with
    Sk minor, the group slice is aligned, and the layout feeds the MXU
    directly (QK^T contracts kT's sublanes; PV is the A·B^T form).
    """
    bh = pl.program_id(0)
    q = q_ref[0]  # (block_q, Dh)
    dh = q.shape[-1]

    def dma(buf, hbm, slot, g, sem):
        return pltpu.make_async_copy(
            hbm.at[bh, :, pl.ds(g * group, group)], buf.at[slot],
            sem.at[slot])

    dma(kbuf, k_hbm, 0, 0, ksem).start()
    dma(vbuf, v_hbm, 0, 0, vsem).start()
    m_run = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_run = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, dh), jnp.float32)
    for g in range(n_groups):  # static unroll: bases stay Python ints
        slot = g % 2
        if g + 1 < n_groups:
            dma(kbuf, k_hbm, 1 - slot, g + 1, ksem).start()
            dma(vbuf, v_hbm, 1 - slot, g + 1, vsem).start()
        dma(kbuf, k_hbm, slot, g, ksem).wait()
        dma(vbuf, v_hbm, slot, g, vsem).wait()

        # per-chunk stats over this group's dependence-free chunks
        # (transposed-KV twin of _chunk_softmax_stats)
        ms, ls, pvs = [], [], []
        for c in range(group // chunk):
            kT = kbuf[slot, :, c * chunk:(c + 1) * chunk]  # (Dh, chunk)
            vT = vbuf[slot, :, c * chunk:(c + 1) * chunk]
            s = jax.lax.dot_general(
                q, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            tail = g * group + (c + 1) * chunk > kv_len
            if tail:
                col = g * group + c * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            if tail:
                p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
            ms.append(m)
            ls.append(jnp.sum(p, axis=-1, keepdims=True))
            pvs.append(jax.lax.dot_general(
                p.astype(vT.dtype), vT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        if len(ms) == 1:
            m_g, l_g, pv_g = ms[0], ls[0], pvs[0]
        else:
            m_g = functools.reduce(jnp.maximum, ms)
            ws = [jnp.exp2(m - m_g) for m in ms]
            l_g = sum(lc * w for lc, w in zip(ls, ws))
            pv_g = sum(pvc * w for pvc, w in zip(pvs, ws))

        m_new = jnp.maximum(m_run, m_g)
        alpha = jnp.exp2(m_run - m_new)
        beta = jnp.exp2(m_g - m_new)
        l_run = alpha * l_run + beta * l_g
        acc = acc * alpha + pv_g * beta
        m_run = m_new
    o_ref[0] = (acc * jnp.reciprocal(jnp.maximum(l_run, 1e-30))
                ).astype(o_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# --------------------------------------------------------- BSC (no-transpose)
def _bsc_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_heads: int,
                chunk: int, kv_len: int):
    """Heads stay packed in the lane dimension: blocks are contiguous
    (block_q, H*D) slices of the (B, S, C) tensors, so the caller needs NO
    (B,S,H,D)<->(B,H,S,D) transposes — which in-situ lower to layout-
    converting fusions around every attention block (~3.5 ms/fwd at CFG
    batch 8, benchmarks/exp_bsc_insitu.py: -3.3% whole-UNet).

    Per head: the same dependence-free chunking as _onepass_kernel.  Heads
    are chained through a zero-valued marker (head h's q is tied to head
    h-1's denominator) so only ONE head's chunk score blocks are live at a
    time — without it the scheduler may interleave all heads and overflow
    scoped VMEM.  ADVICE r2 suggested ``lax.optimization_barrier`` since a
    compiler pass may legally fold ``x*0.0``; that primitive is
    UNIMPLEMENTED in the Mosaic TPU lowering (verified on this toolchain,
    2026-08-17: "Unimplemented primitive ... optimization_barrier"), so the
    arithmetic marker stays, and benchmarks/exp_bsc_smoke.py compile+times
    the worst-case dispatched shapes on hardware — if a future toolchain
    folds the marker, that smoke surfaces the VMEM overflow immediately.
    (No Inf hazard: l <= block_q * Sk << fp32 max, so sum(l)*0.0 == 0.)"""
    sk_p = k_ref.shape[1]
    dh = q_ref.shape[2] // n_heads
    n_chunks = sk_p // chunk
    q_all = q_ref[0]  # (block_q, H*D)
    marker = jnp.float32(0.0)
    for h in range(n_heads):
        q = q_all[:, h * dh:(h + 1) * dh]
        q = q + marker.astype(q.dtype)  # serialize heads (VMEM bound)
        ms, ls, pvs = [], [], []
        for c in range(n_chunks):
            k = k_ref[0, c * chunk:(c + 1) * chunk, h * dh:(h + 1) * dh]
            v = v_ref[0, c * chunk:(c + 1) * chunk, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * (scale * LOG2E)
            masked = (c + 1) * chunk > kv_len
            if masked:
                col = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            if masked:
                p = jnp.where(s > NEG_INF * 0.5, p, 0.0)
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


#: worst-case VMEM for one BSC grid cell: one head's live chunk scores
#: (block_q * Sk * 4, chunks of one head may all be in flight) + whole K and
#: V at full channel width + q/out blocks.
def _bsc_fits(block_q: int, sk_p: int, c: int, kv_itemsize: int) -> bool:
    total = (block_q * sk_p * 4
             + 2 * sk_p * c * kv_itemsize
             + block_q * c * (4 + 2 * kv_itemsize))
    return total <= _ONEPASS_VMEM_BUDGET


def bsc_fits(sq: int, sk: int, c: int, kv_itemsize: int = 2,
             block_q: int = 256, batch: int = 1) -> bool:
    """Public dispatch predicate for ops.attention (non-causal self-attn).

    ``batch`` guard (empirical): the kernel's scoped-vmem stack allocation
    sits ~100 KB under the 16 MB limit at the 4096-token/C=320 shape; at
    CFG batch 16 Mosaic's allocation crosses it (16.13M observed) even
    though per-cell shapes are identical.  Rather than ride the cliff,
    batches past 8 use the head-split kernel (status quo for them)."""
    sk_p = -(-max(sk, 128) // 128) * 128
    return sk >= 256 and batch <= 8 and _bsc_fits(block_q, sk_p, c, kv_itemsize)


@functools.partial(jax.jit, static_argnames=("n_heads", "block_q", "chunk"))
def flash_attention_bsc(q, k, v, *, n_heads: int, block_q: int = 256,
                        chunk: int = None):
    """Flash attention on (B, S, H*D) tensors — heads packed in lanes.

    Non-causal self-attention only (the UNet/VAE spatial case).  Equivalent
    numerics to ``flash_attention`` on the head-split layout, without the
    surrounding transposes."""
    b, sq, c = q.shape
    sk = k.shape[1]
    dh = c // n_heads
    scale = 1.0 / (dh**0.5)
    sk_p = -(-max(sk, 128) // 128) * 128
    if chunk is None:
        chunk = sk_p
        cc = 1024
        while cc <= sk_p:
            if sk_p % cc == 0 and sk_p // cc <= _MAX_CHUNKS:
                chunk = cc
                break
            cc *= 2
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, chunk)
    vp = _pad_to(v, 1, chunk)
    sq_p = qp.shape[1]
    q_spec = pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, kp.shape[1], c), lambda bi, qi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bsc_kernel, scale=scale, n_heads=n_heads,
                          chunk=chunk, kv_len=sk),
        grid=(b, sq_p // block_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq_p, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :sq]


#: one-pass VMEM budget for a whole grid cell.  The chunks are deliberately
#: DEPENDENCE-FREE so the scheduler can overlap them — which means in the
#: worst case EVERY chunk's f32 score block is live at once: the footprint
#: is block_q * Sk * 4 regardless of chunk size, plus whole-KV residency and
#: the per-chunk accumulators.  16 MB scoped vmem on v5e; leave headroom.
_ONEPASS_VMEM_BUDGET = 12 * 1024 * 1024
_MAX_CHUNKS = 16  # unroll bound (compile time)


def _pick_chunk(block_q: int, sk_p: int, dh: int, kv_itemsize: int):
    """Chunk size for the one-pass kernel at this block_q, or None -> the
    cell does not fit VMEM (shrink block_q or use the multi-pass grid).

    Prefers 512 (the swept optimum at SD's 4096-token shape), growing by
    powers of two until the unroll bound holds.

    The additive model below under-counts Mosaic's real stack allocation
    (double-buffered blocks, bf16 score casts): 16384 tokens at block_q 128
    models ~11.4 MB but allocates 16.06 MB (64 KB over the limit, measured).
    9216 tokens (768²) is the largest shape verified to compile AND win over
    multi-pass on hardware, so cap the one-pass path there; longer KV takes
    the multi-pass grid, whose VMEM is O(block_q x block_k) by construction."""
    if sk_p > 9216:
        return None
    chunk = sk_p
    c = 512
    while c <= sk_p:
        if sk_p % c == 0 and sk_p // c <= _MAX_CHUNKS:
            chunk = c
            break
        c *= 2
    n = sk_p // chunk
    total = (block_q * sk_p * 4                    # all chunk scores live
             + 2 * sk_p * dh * kv_itemsize         # whole K and V
             + n * block_q * dh * 4                # per-chunk accumulators
             + block_q * dh * (4 + 2 * kv_itemsize))  # q in, out
    return chunk if total <= _ONEPASS_VMEM_BUDGET else None


@functools.partial(jax.jit, static_argnames=("block_q", "group", "chunk"))
def _flash_attention_streamed(q, k, v, *, block_q: int = 256,
                              group: int = 4096, chunk: int = 512):
    """Long-KV non-causal flash via the manual-DMA streaming kernel.

    q,k,v: (B, H, S*, Dh).  KV stays in HBM; each grid cell walks it in
    double-buffered ``group``-token slabs (see _streamed_kernel)."""
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    scale = 1.0 / (dh**0.5)
    qp = _pad_to(q.reshape(b * h, sq, dh), 1, block_q)
    # transposed KV: (BH, Dh, Sk) — see _streamed_kernel docstring
    kp = _pad_to(k.reshape(b * h, sk, dh).swapaxes(1, 2), 2, group)
    vp = _pad_to(v.reshape(b * h, sk, dh).swapaxes(1, 2), 2, group)
    sq_p, sk_p = qp.shape[1], kp.shape[2]
    n_groups = sk_p // group
    q_spec = pl.BlockSpec((1, block_q, dh), lambda bh, qi: (bh, qi, 0),
                          memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out = pl.pallas_call(
        functools.partial(_streamed_kernel, scale=scale, kv_len=sk,
                          group=group, chunk=chunk, n_groups=n_groups,
                          block_q=block_q),
        grid=(b * h, sq_p // block_q),
        in_specs=[q_spec, hbm_spec, hbm_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, dh, group), k.dtype),   # K^T double buffer
            pltpu.VMEM((2, dh, group), v.dtype),   # V^T double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :sq].reshape(b, h, sq, dh)


@functools.partial(jax.jit, static_argnames=("causal", "policy", "block_q",
                                             "block_k", "block_chunk"))
def flash_attention(q, k, v, *, causal: bool = False, policy: Policy = FP32,
                    block_q: int = None, block_k: int = None,
                    block_chunk: int = None):
    """q: (B, H, Sq, Dh); k,v: (B, H, Sk, Dh) -> (B, H, Sq, Dh).

    ``block_chunk`` overrides the multi-pass kernel's intra-step chunk size
    (benchmarks only; pass block_chunk == block_k to force the serial
    QK->exp->PV form)."""
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    scale = 1.0 / (dh**0.5)

    sk_padded = -(-max(sk, 128) // 128) * 128
    kv_itemsize = jnp.dtype(k.dtype).itemsize
    if (block_q is None and block_k is None and block_chunk is None
            and not causal and dh <= 128 and sk_padded > 9216):
        # long-KV default: the manual-DMA streamed kernel — whole KV walk
        # in one grid cell, double-buffered group DMAs, no per-step grid
        # serialization.  Swept at (2,8,16384,40): 52.1 TFLOP/s vs 50.0
        # multi-pass chunked / ~29 round-2 serial (benchmarks/
        # exp_flash_long.py + streamed follow-ups).
        return _flash_attention_streamed(
            q, k, v, block_q=512 if sq >= 512 else 256,
            group=4096, chunk=1024)
    if block_q is None:
        # Swept on v5e with the chunked kernel (benchmarks/exp_flash_chunked
        # .py): 512 wins at the SD shapes; for very long KV (768² -> 9216,
        # 1024² -> 16384 tokens) shrink until the whole cell fits VMEM.
        block_q = 512
        while block_q > 128 and _pick_chunk(block_q, sk_padded, dh,
                                            kv_itemsize) is None:
            block_q //= 2
        if _pick_chunk(block_q, sk_padded, dh, kv_itemsize) is None \
                and sk_padded > 9216 and dh <= 128:
            # long-KV multi-pass: VMEM is O(block_q * block_k) by
            # construction.  Swept on hardware at (2,8,16384,40)
            # (benchmarks/exp_flash_long.py + follow-up probe): block_q 256
            # / block_k 8192 / chunk 512 = 50 TFLOP/s vs ~29 for the
            # round-2 128/2048 serial form; block_q 512 loses ~1 TFLOP/s
            # and 128 loses ~20.
            block_q = 256
    block_q = min(block_q, max(8, sq))
    if block_k is None:
        one_pass_ok = _pick_chunk(block_q, sk_padded, dh,
                                  kv_itemsize) is not None
        if one_pass_ok:
            block_k = sk_padded
        else:
            # prefer the widest swept kv step that divides the padded KV
            # (divisibility avoids tail padding waste at e.g. 25600
            # tokens); wide dh (VAE's 512) keeps 2048 — its double-buffered
            # K/V blocks alone would blow VMEM at 8192
            block_k = 2048
            if dh <= 128:
                for cand in (8192, 4096):
                    if sk_padded % cand == 0:
                        block_k = cand
                        break
    block_k = min(block_k, max(128, sk))
    if causal and block_k < sk_padded and block_q != block_k:
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
        chunk = _pick_chunk(block_q, sk_p, dh, jnp.dtype(k.dtype).itemsize)
        if chunk is None:  # caller forced one-pass past the budget
            chunk = sk_p
        kv_spec = pl.BlockSpec((1, sk_p, dh), lambda bh, qi: (bh, 0, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_onepass_kernel, scale=scale, kv_len=sk,
                              causal=causal, block_q=block_q, chunk=chunk),
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

    # chunk the block_k span for MXU/VPU overlap within each kv step.
    # Swept at 16384 tokens (benchmarks/exp_flash_long.py + probes): 512
    # wins at block_k 8192 (50.0 TFLOP/s), 2048 wins at block_k 4096
    # (48.0 vs 46.3/43.9 for 512/1024); whole-block when nothing divides.
    blk_chunk = block_chunk
    if blk_chunk is None:
        blk_chunk = block_k
        prefs = (2048, 512, 1024) if block_k == 4096 else (512, 1024)
        for c in prefs:
            if block_k % c == 0 and block_k // c <= _MAX_CHUNKS:
                blk_chunk = c
                break
    kv_spec = pl.BlockSpec((1, block_k, dh), lambda bh, qi, ki: (bh, ki, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, kv_len=sk, block_k=block_k,
            causal=causal, block_q=block_q, chunk=blk_chunk,
            n_kv_steps=nk,
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
