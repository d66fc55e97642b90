"""Hypertile: tile-local self-attention (the A1111 built-in "Hypertile"
perf setting; tfernd/HyperTile).  Static version: one tile-side choice per
block (the largest divisor <= tile), tiles folded into the batch axis.

Exactness contract: a grid that already fits one tile runs the PLAIN
attention path bit-identically; below min_tokens nothing changes either.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models.config import with_hypertile


# ----------------------------------------------------------- fold helpers
def test_hypertile_sides_divisor_choice():
    assert unet_mod.hypertile_sides(64, 64, 32) == (32, 32)
    assert unet_mod.hypertile_sides(96, 64, 32) == (32, 32)
    # 40 has divisors 20, 10, 8 ... below 32 -> 20
    assert unet_mod.hypertile_sides(40, 64, 32) == (20, 32)
    # grid already fits one tile -> None (exact / off)
    assert unet_mod.hypertile_sides(16, 16, 32) is None
    assert unet_mod.hypertile_sides(32, 32, 32) is None
    # a prime side has no divisor in [2, tile]: that axis stays untiled
    # (divisor 1 would mean 1-row strip "tiles" — harsher than upstream
    # HyperTile intends); the other axis still tiles
    assert unet_mod.hypertile_sides(61, 64, 32) == (61, 32)
    # neither axis tileable -> None (degenerate tile=1 included)
    assert unet_mod.hypertile_sides(61, 53, 32) is None
    assert unet_mod.hypertile_sides(4, 4, 1) is None


def test_hypertile_fold_roundtrip_and_indexing():
    h, w, th, tw, c = 6, 8, 3, 4, 5
    rs = np.random.RandomState(0)
    t = jnp.asarray(rs.randn(2, h * w, c).astype(np.float32))
    folded = unet_mod.hypertile_fold(t, h, w, th, tw)
    assert folded.shape == (2 * (h // th) * (w // tw), th * tw, c)
    back = unet_mod.hypertile_unfold(folded, h, w, th, tw)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(t))

    # index semantics: token (y, x) of sample b lands in tile
    # (y//th, x//tw) at in-tile position (y%th)*tw + (x%tw)
    idx = jnp.arange(h * w, dtype=jnp.float32)[None, :, None]
    fi = np.asarray(unet_mod.hypertile_fold(idx, h, w, th, tw))[..., 0]
    nh, nw = h // th, w // tw
    for y in range(h):
        for x in range(w):
            tile = (y // th) * nw + (x // tw)
            pos = (y % th) * tw + (x % tw)
            assert fi[tile, pos] == y * w + x


# ------------------------------------------------------------ block level
def test_attn_block_hypertile_exact_when_single_tile(tiny_cfg, tiny_models):
    """tile >= grid -> the plan is None and the plain path runs: outputs
    must be BIT-identical."""
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, tiny_cfg.clip.max_len, cfg.d_context))
    base = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg)
    big = dataclasses.replace(cfg, hypertile=(64, 0))
    same = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, big)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(base))


def test_attn_block_hypertile_differs_from_global(tiny_cfg, tiny_models):
    """With a real tiling (8x8 grid, tile 4 -> four 16-token tiles) the
    output must DIFFER from global attention (tiles no longer see each
    other); below min_tokens no block qualifies and the forward is
    bit-identical to off.  (Tile-locality itself is pinned by the fold
    indexing test above: each folded sequence contains exactly one tile's
    tokens, and attention.apply treats batch rows independently.)"""
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, tiny_cfg.clip.max_len, cfg.d_context))
    ht = dataclasses.replace(cfg, hypertile=(4, 64))
    base = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg)
    tiled = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, ht)
    assert np.abs(np.asarray(tiled) - np.asarray(base)).max() > 1e-5
    # below min_tokens nothing qualifies -> bit-identical to off
    ht_off = dataclasses.replace(cfg, hypertile=(4, 4096))
    off = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, ht_off)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(base))


# --------------------------------------------------------------- pipeline
def test_pipeline_hypertile(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer,
              height=16, width=16, n_inference_steps=2, seed=3,
              return_latents=True)
    _, base_lat = sdt.generate("a photo of a dog", config=tiny_cfg, **kw)
    cfg_ht = with_hypertile(tiny_cfg, 2, min_tokens=16)
    img, lat = sdt.generate("a photo of a dog", config=cfg_ht, **kw)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(lat).all()
    assert np.abs(lat - base_lat).max() > 1e-5
    # deterministic
    _, lat2 = sdt.generate("a photo of a dog", config=cfg_ht, **kw)
    np.testing.assert_array_equal(lat, lat2)
    # single-tile config == baseline exactly (graph differs only by the
    # no-op plan)
    cfg_big = with_hypertile(tiny_cfg, 64, min_tokens=16)
    _, lat3 = sdt.generate("a photo of a dog", config=cfg_big, **kw)
    np.testing.assert_array_equal(lat3, base_lat)
    # rejects reference_image (bank needs the full grid)
    ref = np.zeros((16, 16, 3), np.uint8)
    with pytest.raises(ValueError, match="hypertile"):
        sdt.generate("a dog", config=cfg_ht, reference_image=ref,
                     models=tiny_models, tokenizer=tiny_tokenizer,
                     height=16, width=16, n_inference_steps=2)


def test_with_hypertile_validation(tiny_cfg):
    assert with_hypertile(tiny_cfg, 0).unet.hypertile is None
    assert with_hypertile(tiny_cfg, None).unet.hypertile is None
    assert with_hypertile(tiny_cfg, 32).unet.hypertile == (32, 4096)
    with pytest.raises(ValueError, match="tile"):
        with_hypertile(tiny_cfg, -3)
