"""Fused GroupNorm->SiLU->3x3-conv Pallas kernel (the UNet res-block body).

The reference res block is GN -> SiLU -> 3x3 conv (diffusion.py:83-209; both
halves, with the time embedding added between them).  XLA runs the conv
itself at 49-70% MFU isolated at SD shapes, but the GN stats reduce + the
normalize/SiLU elementwise + the conv input read are separate HBM round
trips.  This kernel folds them:

- GroupNorm collapses to a per-(batch, channel) affine once its statistics
  are known: ``gn(v) = v*scale + shift`` with ``scale = rstd_g * gamma_c``
  and ``shift = beta_c - mean_g*rstd_g*gamma_c``.  The stats are a tiny
  reduce XLA does well; the kernel takes the folded (B, C) affine and never
  needs group logic.  The res block's ``h + t_emb`` add folds in the same
  way (t is per-(b, c)): stats are taken over ``x + t`` and ``t`` joins the
  shift, so the kernel reads the RAW ``x`` and the broadcast add never
  materializes.
- The kernel computes ``a = silu(x*scale + shift)`` into zero-bordered VMEM
  scratch (the conv pads the ACTIVATED tensor with zeros, so borders are
  written as zeros, not activated zeros) and accumulates the nine shifted
  taps as 2D matmuls on the MXU: ``acc += a[dy:dy+bh] . W[dy, dx]`` with
  the dx shift pre-materialized in three scratch copies so each row slice
  is a layout-preserving reshape (W is a sublane multiple).
- Grid is (Co blocks, B groups, H blocks) — weight-stationary: the weight
  block loads once per Co step and stays resident while batch/row blocks
  stream.  Halo rows (H-block +-1) cannot be expressed as disjoint
  BlockSpec tiles, so x stays in HBM (memory_space=ANY) and each program
  DMAs its ``bh + 2`` row window manually (guide: Async DMA; same pattern
  as the streamed flash kernel).

Numerics: stats and the affine are fp32 (policy.norm_dtype convention),
activation math runs fp32 in-kernel, matmuls in the input dtype with fp32
accumulation — equivalent to the XLA path up to bf16 rounding of the
(x + t) sum, which the XLA path rounds before normalizing (tests assert
tolerance, not bit equality).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# scoped-VMEM budget per kernel invocation; stay well below the 16 MB cliff
# (round-2 lesson: the allocator's stack assignment shifts with grid size —
# don't ride the edge)
_VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_hbm, scale_ref, shift_ref, w_ref, b_ref, out_ref,
            raw, a0, a1, a2, sems, *, bh: int, n_hb: int, bg: int,
            h_total: int, w_px: int, c_in: int, co_blk: int):
    h_i = pl.program_id(2)
    b0 = pl.program_id(1) * bg
    h0 = h_i * bh

    def copy(b, src, dst, length):
        return pltpu.make_async_copy(
            x_hbm.at[b0 + b, pl.ds(src, length)],
            raw.at[b, pl.ds(dst, length)], sems.at[b])

    if n_hb == 1:
        # whole image in one block: rows land at raw[1:H+1], borders masked
        for b in range(bg):
            copy(b, 0, 1, h_total).start()
        for b in range(bg):
            copy(b, 0, 1, h_total).wait()
    else:
        first = h_i == 0
        last = h_i == n_hb - 1
        interior = jnp.logical_and(jnp.logical_not(first),
                                   jnp.logical_not(last))

        @pl.when(interior)
        def _():
            for b in range(bg):
                copy(b, h0 - 1, 0, bh + 2).start()

        @pl.when(first)
        def _():
            for b in range(bg):
                copy(b, 0, 1, bh + 1).start()

        @pl.when(last)
        def _():
            for b in range(bg):
                copy(b, h0 - 1, 0, bh + 1).start()

        @pl.when(interior)
        def _():
            for b in range(bg):
                copy(b, h0 - 1, 0, bh + 2).wait()

        @pl.when(first)
        def _():
            for b in range(bg):
                copy(b, 0, 1, bh + 1).wait()

        @pl.when(last)
        def _():
            for b in range(bg):
                copy(b, h0 - 1, 0, bh + 1).wait()

    # raw row r holds global row h0 - 1 + r; rows outside [0, H) are
    # garbage (not DMA'd) and masked to zero — the conv's zero padding in
    # the ACTIVATED domain
    if n_hb == 1:
        lo, hi = 1, bh + 1
    else:
        lo = jnp.where(h_i == 0, 1, 0)
        hi = jnp.where(h_i == n_hb - 1, bh + 1, bh + 2)
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, 1, 1), 0)
    rowmask = jnp.logical_and(r_idx >= lo, r_idx < hi)

    for b in range(bg):
        xf = raw[b].astype(jnp.float32)
        # scale/shift ride unblocked (B, C): a (1, sublane) block would
        # violate the Mosaic min-tile rule, so index the row dynamically
        sc = scale_ref[pl.ds(b0 + b, 1)].astype(jnp.float32
                                                ).reshape(1, 1, c_in)
        sh = shift_ref[pl.ds(b0 + b, 1)].astype(jnp.float32
                                                ).reshape(1, 1, c_in)
        v = xf * sc + sh
        act = (v * jax.nn.sigmoid(v))
        act = jnp.where(rowmask, act, 0.0).astype(raw.dtype)
        a1[b] = act
        # dx shifts along W with a zero edge column (the W-padding)
        zcol = jnp.zeros((bh + 2, 1, c_in), raw.dtype)
        a0[b] = jnp.concatenate([zcol, act[:, : w_px - 1]], axis=1)
        a2[b] = jnp.concatenate([act[:, 1:], zcol], axis=1)

    m = bh * w_px
    for b in range(bg):
        acc = jnp.zeros((m, co_blk), jnp.float32)
        for dy in range(3):
            for dx, a in ((0, a0), (1, a1), (2, a2)):
                lhs = a[b, dy:dy + bh].reshape(m, c_in)
                acc += jnp.dot(lhs, w_ref[dy, dx],
                               preferred_element_type=jnp.float32)
        acc = acc + b_ref[:].astype(jnp.float32)
        out_ref[b] = acc.reshape(bh, w_px, co_blk).astype(out_ref.dtype)


def _estimate_vmem(bg, bh, w_px, c_in, co_blk, itemsize):
    scratch = 4 * bg * (bh + 2) * w_px * c_in * itemsize      # raw + 3 act
    weights = 2 * 9 * c_in * co_blk * itemsize                 # double-buffered
    outblk = 2 * bg * bh * w_px * co_blk * itemsize
    acc = bh * w_px * co_blk * 4
    affine = 2 * bg * c_in * 4
    # live fp32 vector temporaries in the activation body (xf/v/act are
    # full (bh+2, w, c_in) fp32 values before the bf16 store): omitting
    # them rode the 16 MB cliff at SDXL's (2,32,32,640->1280) level —
    # Mosaic allocated 16.17M against a 12.94M estimate (round-5 queue-10
    # failure; the round-2 "don't ride the cliff" lesson again).  The
    # activation loop is UNROLLED over bg, and Mosaic's stack assignment
    # is not guaranteed to reuse a dead iteration's slots, so the term
    # scales with bg (conservative beats the cliff).
    temps = 2 * bg * (bh + 2) * w_px * c_in * 4
    return scratch + weights + outblk + acc + affine + temps


def _divisors_desc(n, start):
    return [d for d in range(min(start, n), 0, -1) if n % d == 0]


def _co_candidates(c_out):
    """Mosaic lane rule: the Co block must be the whole axis or a multiple
    of 128."""
    cands = [c_out] + [d for d in _divisors_desc(c_out, 512)
                       if d % 128 == 0 and d != c_out]
    return sorted(set(cands), reverse=True)


@functools.lru_cache(maxsize=None)
def _pick_blocks(batch, h_px, w_px, c_in, c_out, itemsize):
    """Largest (bg, bh, co_blk) fitting the VMEM budget, preferring big
    matmul tiles (bh first, then bg, then co)."""
    for co_blk in _co_candidates(c_out):
        for bh in _divisors_desc(h_px, h_px):
            for bg in _divisors_desc(batch, batch):
                if _estimate_vmem(bg, bh, w_px, c_in, co_blk,
                                  itemsize) <= _VMEM_BUDGET:
                    return bg, bh, co_blk
    raise ValueError(
        f"no block assignment fits VMEM for shape "
        f"(B={batch}, {h_px}x{w_px}, {c_in}->{c_out})")


def eligible(x_shape, kernel_shape, itemsize: int = 2) -> bool:
    """Can the fused kernel run this conv?  3x3, sublane-aligned W,
    lane-aligned C (on hardware), and a block assignment that fits the
    VMEM budget.  ``itemsize`` must be the activation dtype's (the block
    search is footprint-bound: an fp32 policy can be ineligible where
    bf16 fits).

    ``c_in % 128`` (Mosaic only, not interpret mode): the halo-row DMA
    slices x on its minor (channel) dim; Mosaic pads memrefs to 128 lanes
    and rejects slices whose minor extent isn't a multiple of 128 ("Slice
    shape along dimension 3 must be aligned to tiling (128)") — the
    round-3 streamed-flash lesson again.  SD's 320/960-ch levels fall
    back to XLA; 640/1280/1920/2560 qualify.
    """
    b_n, h_px, w_px, c_in = x_shape
    if tuple(kernel_shape[:3]) != (3, 3, c_in) or w_px % 8 or h_px < 1:
        return False
    if c_in % 128 and jax.default_backend() == "tpu":
        return False
    try:
        _pick_blocks(b_n, h_px, w_px, c_in, kernel_shape[3], itemsize)
        return True
    except ValueError:
        return False


def scaled_silu_conv3x3(x, scale, shift, kernel, bias, *,
                        block_h: Optional[int] = None,
                        co_block: Optional[int] = None,
                        batch_group: Optional[int] = None,
                        interpret: Optional[bool] = None):
    """``conv3x3(silu(x*scale[b] + shift[b]), kernel) + bias`` (SAME pad).

    x: (B, H, W, C); scale/shift: (B, C) fp32 (see ``fold_gn_affine``);
    kernel: (3, 3, C, Co) HWIO; bias: (Co,).  Returns (B, H, W, Co) in
    x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b_n, h_px, w_px, c_in = x.shape
    if kernel.shape[:3] != (3, 3, c_in):
        raise ValueError(f"kernel {kernel.shape} is not 3x3x{c_in}xCo")
    c_out = kernel.shape[3]
    if w_px % 8:
        raise ValueError(f"W={w_px} must be a sublane multiple (8)")
    if c_in % 128 and not interpret:
        raise ValueError(
            f"C={c_in} must be a lane multiple (128) on hardware: the halo "
            f"DMA slices x on its minor dim and Mosaic requires 128-aligned "
            f"slices")
    bg_d, bh_d, co_d = _pick_blocks(b_n, h_px, w_px, c_in, c_out,
                                    x.dtype.itemsize)
    bg = batch_group or bg_d
    bh = block_h or bh_d
    co_blk = co_block or co_d
    if h_px % bh or b_n % bg or c_out % co_blk:
        raise ValueError(f"blocks ({bg},{bh},{co_blk}) must divide "
                         f"(B={b_n}, H={h_px}, Co={c_out})")
    n_hb = h_px // bh
    grid = (c_out // co_blk, b_n // bg, n_hb)

    kern = functools.partial(
        _kernel, bh=bh, n_hb=n_hb, bg=bg, h_total=h_px, w_px=w_px,
        c_in=c_in, co_blk=co_blk)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((b_n, c_in), lambda co, bi, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_n, c_in), lambda co, bi, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_in, co_blk),
                         lambda co, bi, h: (0, 0, 0, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_blk), lambda co, bi, h: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bg, bh, w_px, co_blk),
                               lambda co, bi, h: (bi, h, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_n, h_px, w_px, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bg, bh + 2, w_px, c_in), x.dtype),
            pltpu.VMEM((bg, bh + 2, w_px, c_in), x.dtype),
            pltpu.VMEM((bg, bh + 2, w_px, c_in), x.dtype),
            pltpu.VMEM((bg, bh + 2, w_px, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((bg,)),
        ],
        interpret=interpret,
    )(x, scale, shift, kernel, bias.reshape(1, c_out))


def fold_gn_affine(norm_params, x, num_groups: int, *, eps: float = 1e-5,
                   temb=None, norm_dtype=jnp.float32):
    """Fold GroupNorm(+optional per-(B,C) add) into (scale, shift) (B, C).

    Matches ops/norm.group_norm semantics: stats in fp32 over spatial dims
    and the within-group channel dim of ``x`` (+ ``temb`` broadcast, the
    res-block second half).  Returns fp32 (B, C) arrays for
    ``scaled_silu_conv3x3``.
    """
    b_n, c = x.shape[0], x.shape[-1]
    if temb is None:
        v = x
    else:
        tb = temb.reshape((temb.shape[0],) + (1,) * (x.ndim - 2)
                          + (temb.shape[-1],))
        v = x + tb.astype(x.dtype)
    vf = v.astype(norm_dtype).reshape(b_n, -1, num_groups, c // num_groups)
    mean = vf.mean(axis=(1, 3))                       # (B, G)
    var = ((vf - mean[:, None, :, None]) ** 2).mean(axis=(1, 3))
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))        # (B, G)
    per_ch = c // num_groups
    mean_c = jnp.repeat(mean, per_ch, axis=1)         # (B, C)
    rstd_c = jnp.repeat(rstd, per_ch, axis=1)
    gamma = norm_params["scale"].astype(norm_dtype)[None, :]
    beta = norm_params["bias"].astype(norm_dtype)[None, :]
    scale = rstd_c * gamma
    shift = beta - mean_c * scale
    if temb is not None:
        shift = shift + temb.astype(norm_dtype) * scale
    return scale, shift


def gn_silu_conv3x3(norm_params, conv_params, x, num_groups: int, *,
                    eps: float = 1e-5, temb=None,
                    interpret: Optional[bool] = None, **block_kw):
    """Whole fused res-block half: GN(x [+ temb]) -> SiLU -> 3x3 conv.

    Drop-in for ``conv.apply(conv_p, norm.group_norm_silu(norm_p, x), pad=1)``
    (plus the ``h + t[:, None, None]`` add when ``temb`` is given).
    """
    scale, shift = fold_gn_affine(norm_params, x, num_groups, eps=eps,
                                  temb=temb)
    return scaled_silu_conv3x3(x, scale, shift,
                               conv_params["kernel"].astype(x.dtype),
                               conv_params["bias"].astype(jnp.float32),
                               interpret=interpret, **block_kw)
