"""T2I-Adapter (Mou et al. 2023, arXiv:2302.08453) — lightweight spatial
conditioning.

The reference has no adapter support; this implements the published
"full adapter" architecture (the diffusers ``T2IAdapter`` /
TencentARC layout): PixelUnshuffle(downsample_factor) on the hint image,
a 3x3 conv into the UNet's base width, then one AdapterBlock per UNet
level — AvgPool-2 downsample (levels > 0), an optional 1x1 ``in_conv`` on
channel change, and ``num_res_blocks`` residual units (3x3 conv -> ReLU ->
1x1 conv, residual add).

Unlike ControlNet the adapter never sees the latents, timestep, or text
context — its features are a pure function of the hint image, so the
pipeline computes them ONCE per generation and the per-step cost is four
adds.  Consumption contract (diffusers ``down_intrablock_additional_
residuals``, ``unet.adapter_sites``): at levels WITH attention the
residual is added after the last res/attn block of the level, before the
downsample — landing in the recorded skip AND the backbone; at levels
WITHOUT attention it is added to the backbone only, after the level's
final stage (its downsample, or its last block at the bottom level); a
leftover (n_levels+1)-th feature is added after the bottleneck
(``unet.apply(adapter=...)``).

Two published layouts, selected by the UNet family
(:func:`adapter_layout`): ``full_adapter`` (SD-1.x/2.x — one block per
UNet level, unshuffle = the VAE factor, AvgPool-2 before every block but
the first) and ``full_adapter_xl`` (SDXL — n_levels+1 blocks, unshuffle =
2x the VAE factor so the chain starts one level down, a single AvgPool
before the second-to-last block, last feature consumed by the mid
block).

TPU-native: NHWC throughout; the unshuffle is a reshape/transpose XLA
fuses into the first conv; all convs ride the MXU in the policy's compute
dtype.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from ..ops import conv
from .config import UNetConfig


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC pixel-unshuffle with torch channel ordering (c*f*f + i*f + j),
    so converted ``conv_in`` weights from torch checkpoints stay exact."""
    b, h, w, c = x.shape
    if h % factor or w % factor:
        raise ValueError(f"hint {h}x{w} not divisible by unshuffle factor "
                         f"{factor}")
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, h/f, w/f, C, fh, fw
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def adapter_layout(cfg: UNetConfig, downsample_factor: int,
                   xl: bool = None):
    """(per-block channels, per-block AvgPool flags, unshuffle factor) for
    the family's published adapter.  ``xl=None`` infers ``full_adapter_xl``
    for SDXL-class configs (added conditioning present).

    ``full_adapter`` (SD-1.x): channels = level_channels, pool before every
    block but the first, unshuffle = the VAE factor — feature *i* at the
    latent resolution of level *i*.  ``full_adapter_xl``: channels =
    level_channels + (last,), unshuffle = 2x the VAE factor (the chain
    starts at latent/2 — level 0's POST-downsample resolution), one pool
    before block 2 (published SDXL shape: (320, 640, 1280, 1280) at
    (64, 64, 32, 32) for 1024² — t2iadapter_*_sdxl_1.0)."""
    if xl is None:
        xl = cfg.add_embed_dim is not None
    lc = cfg.level_channels
    if xl:
        channels = (*lc, lc[-1])
        pools = tuple(2 <= i < len(lc) for i in range(len(channels)))
        return channels, pools, downsample_factor * 2
    return lc, tuple(i > 0 for i in range(len(lc))), downsample_factor


def init(key, cfg: UNetConfig, downsample_factor: int = 8,
         num_res_blocks: int = 2, in_channels: int = 3, dtype=jnp.float32,
         xl: bool = None):
    """Fresh adapter matching ``cfg``'s level structure (published SD-1.x
    shape: (320, 640, 1280, 1280), factor 8, 2 res units —
    t2iadapter_*_sd1xv1; SDXL configs get the ``full_adapter_xl`` layout,
    see :func:`adapter_layout`).  ``downsample_factor`` is always the
    VAE's; the XL unshuffle doubling is internal."""
    channels, _, factor = adapter_layout(cfg, downsample_factor, xl)
    k_in, k_body = jax.random.split(key)
    params = {"conv_in": conv.init(
        k_in, in_channels * factor**2, channels[0], 3, dtype=dtype)}
    body = []
    c_prev = channels[0]
    for i, c in enumerate(channels):
        kb = jax.random.fold_in(k_body, i)
        blk = {}
        if c_prev != c:
            blk["in_conv"] = conv.init(jax.random.fold_in(kb, 10_000),
                                       c_prev, c, 1, dtype=dtype)
        blk["resnets"] = [
            {"block1": conv.init(jax.random.fold_in(kb, 2 * j), c, c, 3,
                                 dtype=dtype),
             "block2": conv.init(jax.random.fold_in(kb, 2 * j + 1), c, c, 1,
                                 dtype=dtype)}
            for j in range(num_res_blocks)]
        body.append(blk)
        c_prev = c
    params["body"] = body
    return params


def _avg_pool2(x: jax.Array) -> jax.Array:
    # AvgPool2d(kernel=2, stride=2) — count_include_pad irrelevant (no pad)
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def apply(params, hint: jax.Array, cfg: UNetConfig,
          downsample_factor: int = 8,
          policy: Policy = FP32, xl: bool = None) -> List[jax.Array]:
    """Hint image (B, H, W, 3) in [0, 1] -> one feature map per insertion
    site (SD: per UNet level at that level's resolution; SDXL: n_levels+1
    features, see :func:`adapter_layout`).  Time-independent: call once
    per generation."""
    _, pools, factor = adapter_layout(cfg, downsample_factor, xl)
    x = pixel_unshuffle(hint.astype(policy.compute_dtype), factor)
    x = conv.apply(params["conv_in"], x, padding=1, policy=policy)
    feats = []
    for i, blk in enumerate(params["body"]):
        if pools[i]:
            x = _avg_pool2(x)
        if "in_conv" in blk:
            x = conv.apply(blk["in_conv"], x, policy=policy)
        for rn in blk["resnets"]:
            h = conv.apply(rn["block1"], x, padding=1, policy=policy)
            h = conv.apply(rn["block2"], jax.nn.relu(h), policy=policy)
            x = x + h
        feats.append(x)
    return feats
