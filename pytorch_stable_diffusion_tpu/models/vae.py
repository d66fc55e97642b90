"""AutoencoderKL — VAE encoder + decoder (functional JAX, NHWC).

Behavior-parity target: ``/root/reference/sd/encoder.py`` and
``sd/decoder.py``.  The reference defines the shared blocks once in
decoder.py (``decoder.py:7-189``) and imports them into the encoder
(``encoder.py:4``); here both live in this module.

Structure (SD-1.5 AutoencoderKL):
  encoder: conv_in -> 4 levels x 2 res blocks (128/128/256/512/512 path,
           stride-2 downsample with the reference's *asymmetric* right/bottom
           pad, ``encoder.py:62,118-122``) -> mid res/attn/res -> GN+SiLU ->
           conv_out (C->2L) -> 1x1 quant_conv -> split mean/logvar, clamp
           logvar to [-30,20] (``encoder.py:131``), reparameterize with
           caller-supplied noise (``encoder.py:147``), scale by 0.18215
           (``encoder.py:152``).
  decoder: 1x1 post_quant_conv -> conv_in -> mid -> 4 levels x 3 res blocks
           (nearest-2x upsample + conv between levels, ``decoder.py:269-313``)
           -> GN+SiLU -> conv_out; input divided by 0.18215 (``decoder.py:364``).

``reference_quirks=True`` reproduces the reference's VAE-attention
un-transpose bug: ``x.transpose(-1, 2)`` on a 3-D tensor is a no-op
(``decoder.py:62``), so the following ``view((n,c,h,w))`` reinterprets
(h*w, c)-ordered memory as (c,h,w) — a channel/spatial scramble present in
both mid-blocks.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import Policy, FP32
from ..ops import attention, conv, norm
from ..ops.act import silu
from ..ops.conv import ASYM_DOWN, upsample_nearest_2x
from .config import VAEConfig


# ---------------------------------------------------------------- res block
def init_res_block(key, c_in: int, c_out: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": norm.init(c_in, dtype),
        "conv1": conv.init(k1, c_in, c_out, 3, dtype=dtype),
        "norm2": norm.init(c_out, dtype),
        "conv2": conv.init(k2, c_out, c_out, 3, dtype=dtype),
    }
    if c_in != c_out:
        p["shortcut"] = conv.init(k3, c_in, c_out, 1, dtype=dtype)
    return p


def apply_res_block(p, x, groups: int, policy: Policy):
    """GN -> SiLU -> conv3x3, twice, + identity/1x1 skip (decoder.py:103-189)."""
    h = silu(norm.group_norm(p["norm1"], x, groups, policy=policy))
    h = conv.apply(p["conv1"], h, padding=1, policy=policy)
    h = silu(norm.group_norm(p["norm2"], h, groups, policy=policy))
    h = conv.apply(p["conv2"], h, padding=1, policy=policy)
    res = conv.apply(p["shortcut"], x, policy=policy) if "shortcut" in p else x
    return h + res


# ----------------------------------------------------------- attention block
def init_attn_block(key, channels: int, dtype=jnp.float32):
    return {
        "norm": norm.init(channels, dtype),
        "attn": attention.init(key, 1, channels, dtype=dtype),
    }


def apply_attn_block(p, x, groups: int, policy: Policy, *,
                     backend: str = "xla", reference_quirks: bool = False):
    """1-head spatial self-attention over H*W tokens, no mask (decoder.py:29-73).

    The reference has TWO bugs here, both reproduced under quirks (verified
    by executing the reference at full size, tests/test_reference_goldens.py):
      * its forward never calls the GroupNorm it initializes — ``residual=x``
        goes straight to view/attention (decoder.py forward body); the norm
        weights are loaded but unused;
      * the un-transpose after attention is the no-op ``transpose(-1, 2)``,
        so ``view((n,c,h,w))`` reinterprets (h*w, c)-ordered memory
        (decoder.py:62,67)."""
    n, h, w, c = x.shape
    res = x
    if reference_quirks:
        y = x  # reference skips its GroupNorm (bug: initialized, never called)
    else:
        y = norm.group_norm(p["norm"], x, groups, policy=policy)
    y = y.reshape(n, h * w, c)
    y = attention.apply(p["attn"], y, n_heads=1, backend=backend, policy=policy)
    if reference_quirks:
        # decoder.py:62,67 — (n, h*w, c) memory reinterpreted as (n, c, h, w).
        y = y.reshape(n, c, h, w).transpose(0, 2, 3, 1)
    else:
        y = y.reshape(n, h, w, c)
    return res + y


def _init_mid(key, ch: int, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "res1": init_res_block(k1, ch, ch, dtype),
        "attn": init_attn_block(k2, ch, dtype),
        "res2": init_res_block(k3, ch, ch, dtype),
    }


def _apply_mid(p, x, groups, policy, backend, quirks):
    x = apply_res_block(p["res1"], x, groups, policy)
    x = apply_attn_block(p["attn"], x, groups, policy,
                         backend=backend, reference_quirks=quirks)
    return apply_res_block(p["res2"], x, groups, policy)


# ------------------------------------------------------------------ encoder
def init_encoder(key, cfg: VAEConfig, dtype=jnp.float32):
    chs = cfg.level_channels
    keys = iter(jax.random.split(key, 4 + 3 * len(chs) + 4))
    params = {"conv_in": conv.init(next(keys), cfg.in_channels, chs[0], 3, dtype=dtype)}
    down = []
    c_prev = chs[0]
    for i, c in enumerate(chs):
        level = {"res": [init_res_block(next(keys), c_prev, c, dtype),
                         init_res_block(next(keys), c, c, dtype)]}
        c_prev = c
        if i < len(chs) - 1:
            level["downsample"] = conv.init(next(keys), c, c, 3, dtype=dtype)
        down.append(level)
    params["down"] = down
    params["mid"] = _init_mid(next(keys), chs[-1], dtype)
    params["norm_out"] = norm.init(chs[-1], dtype)
    params["conv_out"] = conv.init(next(keys), chs[-1], 2 * cfg.latent_channels, 3, dtype=dtype)
    params["quant_conv"] = conv.init(next(keys), 2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1, dtype=dtype)
    return params


def _encoder_down(params, image, cfg: VAEConfig, policy: Policy):
    """Image-resolution down path (conv_in + res/downsample levels) — the
    memory-heavy prefix (128 channels at full image resolution); purely
    local convs + GroupNorms, so it tiles."""
    x = image.astype(policy.compute_dtype)
    x = conv.apply(params["conv_in"], x, padding=1, policy=policy)
    for level in params["down"]:
        for rp in level["res"]:
            x = apply_res_block(rp, x, cfg.groups, policy)
        if "downsample" in level:
            # stride-2, pad right/bottom only (encoder.py:62,118-122)
            x = conv.apply(level["downsample"], x, stride=2, padding=ASYM_DOWN,
                           policy=policy)
    return x


def _encoder_tail(params, x, noise, cfg: VAEConfig, policy: Policy,
                  backend, quirks):
    """Latent-resolution suffix: mid res+attn+res (GLOBAL attention — runs
    whole), head convs, and the reparameterized sample."""
    x = _apply_mid(params["mid"], x, cfg.groups, policy, backend, quirks)
    x = silu(norm.group_norm(params["norm_out"], x, cfg.groups, policy=policy))
    x = conv.apply(params["conv_out"], x, padding=1, policy=policy)
    x = conv.apply(params["quant_conv"], x, policy=policy)

    mean, log_var = jnp.split(x, 2, axis=-1)
    log_var = jnp.clip(log_var.astype(policy.norm_dtype), *cfg.logvar_clamp)
    std = jnp.exp(0.5 * log_var).astype(mean.dtype)
    latents = mean + std * noise.astype(mean.dtype)
    return latents * cfg.scale_factor


def apply_encoder(params, image, noise, cfg: VAEConfig, policy: Policy = FP32,
                  *, attention_backend: str = "xla", reference_quirks: bool = False):
    """image: (N, H, W, 3) in [-1, 1]; noise: (N, H/f, W/f, latent_channels).

    Returns scaled latents (N, H/f, W/f, latent_channels).
    """
    x = _encoder_down(params, image, cfg, policy)
    return _encoder_tail(params, x, noise, cfg, policy,
                         attention_backend, reference_quirks)


def down_receptive_halo(cfg: VAEConfig) -> int:
    """Conv receptive-field radius of the encoder down path, in LATENT px.

    In image pixels: conv_in (1) + per level 2 res blocks x 2 convs at that
    level's stride, + the stride-2 downsample conv; SD-1.5 (4 levels):
    1 + (4+1) + (8+2) + (16+4) + 32 = 68 image px -> ceil(68/8) = 9.
    """
    r = 1.0  # conv_in
    scale = 1.0
    for i in range(len(cfg.ch_mults)):
        r += 4.0 * scale          # 2 res blocks x 2 convs
        if i < len(cfg.ch_mults) - 1:
            r += 1.0 * scale      # downsample conv (reads at this scale)
            scale *= 2.0
    return int(np.ceil(r / cfg.downsample_factor))


def apply_encoder_tiled(params, image, noise, cfg: VAEConfig,
                        policy: Policy = FP32, *, tile: int = 64,
                        halo: Optional[int] = None,
                        attention_backend: str = "xla",
                        reference_quirks: bool = False):
    """Memory-bounded encode for hi-res img2img (no reference analog — the
    reference materializes the whole image, ``encoder.py:95-123``).

    The mirror of :func:`apply_decoder_tiled`: the down path — where memory
    explodes (128 channels at image resolution) — runs as a sequential
    ``lax.map`` over overlapping spatial tiles, while the mid block (incl.
    the GLOBAL attention) and the reparameterized sample run whole at
    latent resolution, where activations are small.

    ``tile``/``halo`` are in LATENT pixels (image-space window =
    ``(tile + 2*halo) * downsample_factor``); window starts land on latent
    (= stride-phase) boundaries, so every tile interior is conv-exact and
    the only approximation is per-window GroupNorm statistics.  ``halo``
    defaults to :func:`down_receptive_halo`.
    """
    f = cfg.downsample_factor
    n, h_img, w_img, _ = image.shape
    h, w = h_img // f, w_img // f
    if halo is None:
        halo = down_receptive_halo(cfg)
    if h <= tile and w <= tile:
        x = _encoder_down(params, image, cfg, policy)
        return _encoder_tail(params, x, noise, cfg, policy,
                             attention_backend, reference_quirks)
    if h % tile or w % tile:
        raise ValueError(f"latent dims {h}x{w} must be multiples of "
                         f"tile={tile} (pick a divisor)")
    win = tile + 2 * halo
    if win > min(h, w):
        halo = (min(h, w) - tile) // 2
        win = tile + 2 * halo
    gh, gw = h // tile, w // tile

    starts = []
    for i in range(gh):
        for j in range(gw):
            si = min(max(i * tile - halo, 0), h - win)
            sj = min(max(j * tile - halo, 0), w - win)
            starts.append((si, sj, i * tile - si, j * tile - sj))
    starts = jnp.asarray(starts, jnp.int32)  # (T, 4)

    def one(st):
        si, sj, oi, oj = st[0], st[1], st[2], st[3]
        win_img = jax.lax.dynamic_slice(
            image, (0, si * f, sj * f, 0),
            (n, win * f, win * f, image.shape[-1]))
        y = _encoder_down(params, win_img, cfg, policy)
        return jax.lax.dynamic_slice(y, (0, oi, oj, 0),
                                     (n, tile, tile, y.shape[-1]))

    tiles = jax.lax.map(one, starts)  # sequential: one tile live at a time
    tiles = tiles.reshape(gh, gw, n, tile, tile, tiles.shape[-1])
    x = tiles.transpose(2, 0, 3, 1, 4, 5).reshape(n, h, w, tiles.shape[-1])
    return _encoder_tail(params, x, noise, cfg, policy,
                         attention_backend, reference_quirks)


# ------------------------------------------------------------------ decoder
def init_decoder(key, cfg: VAEConfig, dtype=jnp.float32):
    chs = cfg.level_channels
    keys = iter(jax.random.split(key, 8 + 4 * len(chs)))
    params = {
        "post_quant_conv": conv.init(next(keys), cfg.latent_channels,
                                     cfg.latent_channels, 1, dtype=dtype),
        "conv_in": conv.init(next(keys), cfg.latent_channels, chs[-1], 3, dtype=dtype),
        "mid": _init_mid(next(keys), chs[-1], dtype),
    }
    up = []  # stored top level (smallest spatial) first — processing order
    c_prev = chs[-1]
    for i in reversed(range(len(chs))):
        c = chs[i]
        level = {"res": [init_res_block(next(keys), c_prev, c, dtype),
                         init_res_block(next(keys), c, c, dtype),
                         init_res_block(next(keys), c, c, dtype)]}
        c_prev = c
        if i > 0:
            level["upsample"] = conv.init(next(keys), c, c, 3, dtype=dtype)
        up.append(level)
    params["up"] = up
    params["norm_out"] = norm.init(chs[0], dtype)
    params["conv_out"] = conv.init(next(keys), chs[0], cfg.in_channels, 3, dtype=dtype)
    return params


def _decoder_head(params, latents, cfg, policy, backend, quirks):
    """Latent-resolution prefix: scale, 1x1/3x3 convs, mid res+attn+res.
    Runs whole-image so the global spatial attention stays exact."""
    x = (latents / cfg.scale_factor).astype(policy.compute_dtype)  # decoder.py:364
    x = conv.apply(params["post_quant_conv"], x, policy=policy)
    x = conv.apply(params["conv_in"], x, padding=1, policy=policy)
    return _apply_mid(params["mid"], x, cfg.groups, policy, backend, quirks)


def _decoder_tail(params, x, cfg, policy):
    """Upsampling tail (post-mid): purely local convs + GroupNorms."""
    for level in params["up"]:
        for rp in level["res"]:
            x = apply_res_block(rp, x, cfg.groups, policy)
        if "upsample" in level:
            x = upsample_nearest_2x(x)
            x = conv.apply(level["upsample"], x, padding=1, policy=policy)
    x = silu(norm.group_norm(params["norm_out"], x, cfg.groups, policy=policy))
    return conv.apply(params["conv_out"], x, padding=1, policy=policy)


def apply_decoder(params, latents, cfg: VAEConfig, policy: Policy = FP32,
                  *, attention_backend: str = "xla", reference_quirks: bool = False):
    """latents: (N, H/f, W/f, latent_channels) -> image (N, H, W, 3), ~[-1, 1]."""
    x = _decoder_head(params, latents, cfg, policy, attention_backend,
                      reference_quirks)
    return _decoder_tail(params, x, cfg, policy)


def tail_receptive_halo(cfg: VAEConfig) -> int:
    """Conv receptive-field radius of the decoder tail, in latent pixels.

    Each 3x3 conv adds a 1-px halo at its own scale = 2^-level latent px:
    per level, 3 res blocks x 2 convs, plus the upsample conv at the next
    scale; plus the final output conv.  SD-1.5 (4 levels): ceil(12.25) = 13.
    """
    r = 0.0
    scale = 1.0
    n_levels = len(cfg.ch_mults)
    for i in range(n_levels):
        r += 6.0 * scale           # 3 res blocks x 2 convs
        if i < n_levels - 1:
            scale /= 2.0
            r += 1.0 * scale       # upsample conv at the finer scale
    r += 1.0 * scale               # conv_out
    return int(np.ceil(r))


def apply_decoder_tiled(params, latents, cfg: VAEConfig, policy: Policy = FP32,
                        *, tile: int = 64, halo: Optional[int] = None,
                        attention_backend: str = "xla",
                        reference_quirks: bool = False):
    """Memory-bounded decode for hi-res outputs (no reference analog — the
    reference materializes the whole image, ``decoder.py:342-374``).

    The head (incl. the GLOBAL mid-block attention) runs whole at latent
    resolution, where activations are small; the upsampling tail — where
    memory explodes (512 channels at image resolution) — runs as a
    sequential ``lax.map`` over overlapping spatial tiles, so peak memory is
    one tile's activations instead of the whole image's.

    ``halo`` defaults to the tail's conv receptive field
    (:func:`tail_receptive_halo`), which makes every tile interior exact
    w.r.t. convolutions; GroupNorm spatial statistics are computed per tile
    (the standard tiled-VAE approximation, cf. diffusers
    ``enable_vae_tiling``) — tested against whole decode in
    tests/test_vae_tiling.py.  Border tiles clamp their window to the image
    so conv zero-padding at the true border matches the whole computation.
    """
    x = _decoder_head(params, latents, cfg, policy, attention_backend,
                      reference_quirks)
    n, h, w, c = x.shape
    if halo is None:
        halo = tail_receptive_halo(cfg)
    if h <= tile and w <= tile:
        return _decoder_tail(params, x, cfg, policy)
    if h % tile or w % tile:
        raise ValueError(f"latent dims {h}x{w} must be multiples of "
                         f"tile={tile} (pick a divisor)")
    win = tile + 2 * halo
    if win > min(h, w):
        halo = (min(h, w) - tile) // 2
        win = tile + 2 * halo
    up = cfg.downsample_factor
    gh, gw = h // tile, w // tile

    starts = []
    for i in range(gh):
        for j in range(gw):
            si = min(max(i * tile - halo, 0), h - win)
            sj = min(max(j * tile - halo, 0), w - win)
            starts.append((si, sj, i * tile - si, j * tile - sj))
    starts = jnp.asarray(starts, jnp.int32)  # (T, 4)

    def one(st):
        si, sj, oi, oj = st[0], st[1], st[2], st[3]
        win_x = jax.lax.dynamic_slice(x, (0, si, sj, 0), (n, win, win, c))
        y = _decoder_tail(params, win_x, cfg, policy)
        return jax.lax.dynamic_slice(
            y, (0, oi * up, oj * up, 0), (n, tile * up, tile * up, y.shape[-1]))

    tiles = jax.lax.map(one, starts)  # sequential: one tile live at a time
    tiles = tiles.reshape(gh, gw, n, tile * up, tile * up, tiles.shape[-1])
    return tiles.transpose(2, 0, 3, 1, 4, 5).reshape(
        n, h * up, w * up, tiles.shape[-1])
