"""AnimateDiff motion modules (Guo et al. 2023) — functional JAX, NHWC.

No reference analog; behavior target is the published
``guoyww/AnimateDiff`` ``VanillaTemporalModule`` /
``TemporalTransformer3DModel`` (the ``mm_sd_v15_v2`` family):

  * GroupNorm(32) -> flatten spatial -> Linear proj_in,
  * per transformer block: TWO temporal self-attention layers (each
    LayerNorm -> rearrange tokens to the FRAME axis -> add fixed
    sinusoidal positional encoding -> attention (bias-free qkv, biased
    out) -> residual), then LayerNorm -> GEGLU feed-forward -> residual,
  * Linear proj_out -> un-flatten -> long residual.

Inserted after every encoder/decoder res(+attn) stage and the bottleneck
(21 modules for the SD-1.5 v2 topology) — models/unet.py ``motion=``.
Tokens attend ONLY across the ``n_frames`` axis (each spatial position
independently), which is what turns a batch of frames into a coherent
clip.  Weight ingestion: weights/animatediff.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from ..ops import attention, linear, norm
from ..ops.act import geglu


def positional_encoding(length: int, channels: int) -> np.ndarray:
    """The module's fixed sinusoidal table (torch ``PositionalEncoding``:
    sin on even channels, cos on odd, log-spaced frequencies; channel
    counts are always even in this family)."""
    assert channels % 2 == 0
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, channels, 2, dtype=np.float64)
                 * (-np.log(10000.0) / channels))
    pe = np.zeros((length, channels), np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def apply_motion(p, x, frames: int, policy: Policy = FP32, *,
                 n_heads: int = 8):
    """x: (G*frames, h, w, C) — G lane groups of ``frames`` each, frame
    index fastest — -> same shape.  The temporal transformer runs over
    the frame axis per spatial position."""
    gf, h, w, c = x.shape
    g = gf // frames
    residual = x
    y = norm.group_norm(p["norm"], x.reshape(gf, h * w, c),
                        num_groups=32 if c % 32 == 0 else c // 4,
                        policy=policy)
    y = linear.apply(p["proj_in"], y, policy)
    # (G*F, hw, C) -> (G*hw, F, C): tokens are frames
    y = y.reshape(g, frames, h * w, c).transpose(0, 2, 1, 3) \
        .reshape(g * h * w, frames, c)
    pe = jnp.asarray(positional_encoding(frames, c))[None].astype(y.dtype)
    for blk in p["blocks"]:
        for ai in (1, 2):
            t = norm.layer_norm(blk[f"norm{ai}"], y, policy=policy)
            t = t + pe
            y = y + attention.apply(blk[f"attn{ai}"], t, n_heads=n_heads,
                                    backend="xla", policy=policy)
        t = norm.layer_norm(blk["ff_norm"], y, policy=policy)
        t = geglu(linear.apply(blk["ff_proj"], t, policy))
        y = y + linear.apply(blk["ff_out"], t, policy)
    y = y.reshape(g, h * w, frames, c).transpose(0, 2, 1, 3) \
        .reshape(gf, h * w, c)
    y = linear.apply(p["proj_out"], y, policy)
    return residual + y.reshape(gf, h, w, c)
