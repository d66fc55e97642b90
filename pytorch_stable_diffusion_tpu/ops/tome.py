"""Token merging for Stable Diffusion (ToMe; Bolya & Hoffman 2023,
``tomesd`` semantics).

No reference analog — a TPU-friendly re-derivation of the A1111 "Token
merging ratio" optimization: before each large self-attention, merge the
``ratio`` most redundant tokens into their most similar neighbours, run
attention on the reduced sequence, then unmerge (merged positions copy
their destination's output).  Everything is STATIC-shaped (merge count
``r`` is a trace-time constant), so the whole transform jits into the
compiled denoise loop:

  * dst tokens: one per ``sx``x``sy`` grid cell (tomesd's stride layout;
    the deterministic top-left member — tomesd's ``use_rand=False``),
  * bipartite soft matching: every src token's best cosine similarity to
    any dst, top-``r`` src tokens merged (mean) into their best dst,
  * unmerge: dst outputs broadcast back to the tokens merged into them.

Merging is APPROXIMATE by design (ratio 0 = exact off, and merging
bit-identical tokens is lossless — tests/test_tome.py proves both).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def plan(h: int, w: int, sx: int = 2, sy: int = 2,
         ratio: float = 0.5) -> Tuple[np.ndarray, np.ndarray, int]:
    """Static merge plan for an (h, w) token grid.

    Returns ``(dst_idx, src_idx, r)``: flat token indices of the dst set
    (one per stride cell, top-left member) and the src set (everything
    else), and the merge count ``r = floor(h*w * ratio)`` — the tomesd /
    A1111 "Token merging ratio" convention counts the TOTAL tokens (a
    review finding: ``ratio * len(src)`` under-merged by 25% at the 2x2
    stride), clamped to the src count like tomesd.
    """
    if h % sy or w % sx:
        raise ValueError(f"token grid {h}x{w} not divisible by the ToMe "
                         f"stride {sy}x{sx}")
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    flat = (ii * w + jj).ravel()
    is_dst = ((ii % sy == 0) & (jj % sx == 0)).ravel()
    dst_idx = flat[is_dst]
    src_idx = flat[~is_dst]
    r = int(h * w * ratio)
    return dst_idx, src_idx, max(0, min(r, len(src_idx) - 1))


def merge(x, dst_idx, src_idx, r: int):
    """x: (B, N, C) -> merged (B, N - r, C) plus the unmerge info.

    The merged layout is ``[unmerged src (n_src - r), dst (n_dst)]``.
    Matching metric: cosine similarity of ``x`` itself (tomesd uses the
    pre-attention LayerNorm output it is given).  fp32 scoring.
    """
    b, n, c = x.shape
    dst = jnp.take(x, jnp.asarray(dst_idx), axis=1)
    src = jnp.take(x, jnp.asarray(src_idx), axis=1)
    xs = src.astype(jnp.float32)
    xd = dst.astype(jnp.float32)
    xs = xs / jnp.maximum(jnp.linalg.norm(xs, axis=-1, keepdims=True), 1e-6)
    xd = xd / jnp.maximum(jnp.linalg.norm(xd, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bsc,bdc->bsd", xs, xd)  # (B, n_src, n_dst)
    best = scores.max(axis=-1)            # (B, n_src) best-dst similarity
    best_dst = scores.argmax(axis=-1)     # (B, n_src) that dst's index
    # top-r most redundant src tokens (descending similarity): argsort is
    # static-shaped; order[:, :r] merge, order[:, r:] stay
    order = jnp.argsort(-best, axis=-1)
    merged_sel = order[:, :r]             # (B, r) src positions to merge
    kept_sel = order[:, r:]               # (B, n_src - r)
    kept = jnp.take_along_axis(src, kept_sel[..., None], axis=1)
    m_vals = jnp.take_along_axis(src, merged_sel[..., None], axis=1)
    m_dst = jnp.take_along_axis(best_dst, merged_sel, axis=1)  # (B, r)
    # mean-merge into dst: scatter-add values and counts per dst
    sums = jnp.zeros(dst.shape, dst.dtype).at[
        jnp.arange(b)[:, None], m_dst].add(m_vals)
    cnt = jnp.zeros((b, dst.shape[1]), jnp.float32).at[
        jnp.arange(b)[:, None], m_dst].add(1.0)
    dst_m = (dst + sums) / (1.0 + cnt)[..., None].astype(dst.dtype)
    out = jnp.concatenate([kept, dst_m], axis=1)
    info = {"dst_idx": jnp.asarray(dst_idx), "src_idx": jnp.asarray(src_idx),
            "kept_sel": kept_sel, "merged_sel": merged_sel, "m_dst": m_dst,
            "n": n}
    return out, info


def unmerge(y, info):
    """y: (B, N - r, C) attention output in merged layout -> (B, N, C):
    every original position gets its token's output; positions that were
    merged copy their destination token's output."""
    b = y.shape[0]
    n_src = info["src_idx"].shape[0]
    r = info["merged_sel"].shape[1]
    kept_y = y[:, : n_src - r]
    dst_y = y[:, n_src - r:]
    src_y = jnp.zeros((b, n_src, y.shape[-1]), y.dtype)
    src_y = src_y.at[jnp.arange(b)[:, None], info["kept_sel"]].set(kept_y)
    merged_vals = jnp.take_along_axis(dst_y, info["m_dst"][..., None], axis=1)
    src_y = src_y.at[jnp.arange(b)[:, None],
                     info["merged_sel"]].set(merged_vals)
    out = jnp.zeros((b, info["n"], y.shape[-1]), y.dtype)
    out = out.at[:, info["dst_idx"]].set(dst_y)
    out = out.at[:, info["src_idx"]].set(src_y)
    return out
