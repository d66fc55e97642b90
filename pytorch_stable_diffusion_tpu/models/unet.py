"""SD-1.5 UNet denoiser (functional JAX, NHWC).

Behavior-parity target: ``/root/reference/sd/diffusion.py``.
  * TimeEmbedding MLP 320 -> 1280 -> 1280 with SiLU (``diffusion.py:8-80``);
    the sinusoidal embedding itself is [cos, sin] — cos first! —
    (``sd/pipeline.py:310-349``) and is computed here, inside the compiled
    graph, instead of the reference's per-step host round-trip
    (``pipeline.py:211``).
  * Residual blocks: GN->SiLU->conv on features, SiLU->Linear on time, add,
    GN->SiLU->conv, skip (``diffusion.py:83-209``).
  * Spatial transformer blocks: GN + 1x1 conv in, LN->self-attn (no qkv
    bias), LN->cross-attn vs 768-d context, LN->GeGLU FFN, 1x1 conv out +
    long residual (``diffusion.py:212-381``).  The reference drops the GeGLU
    gate (``diffusion.py:359-363``) — reproduced only under
    ``reference_quirks``.
  * Encoder: conv_in + 4 levels x 2 (res [+ attn]) with stride-2 pad-1
    downsample convs between levels (``diffusion.py:543-575``); bottleneck
    res/attn/res (``:577-584``); decoder: 4 levels x 3 (res [+ attn]) with
    skip-concat from the 12-deep encoder stack and nearest-2x upsample
    between levels (``:586-626,668-673``); GN+SiLU+conv out (``:679-748``).

The skip-connection discipline matches the reference exactly: one skip pushed
after every encoder stage (including conv_in and downsamples), popped by each
decoder stage (``diffusion.py:658-673``).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import Policy, FP32
from ..ops import attention, conv, linear, norm
from ..ops.act import geglu, silu
from ..ops.conv import upsample_nearest_2x
from .config import UNetConfig


# ------------------------------------------------------- sinusoidal timestep
def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """t: scalar or (B,) -> (B, dim).  [cos, sin] order (pipeline.py:340-349)."""
    t = jnp.atleast_1d(jnp.asarray(t, jnp.float32))
    half = dim // 2
    freqs = jnp.power(max_period, -jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def guidance_scale_embedding(w, dim: int, max_period: float = 10000.0):
    """LCM guidance-scale embedding (Luo et al. 2023 appendix C; the
    diffusers convention fed to ``time_embed/cond_proj``): w scaled by
    1000, half-dim frequency ladder over ``half - 1``, **[sin, cos]**
    order — all three details differ from :func:`timestep_embedding`,
    and the distilled weights bake them in.  w: scalar or (B,) ->
    (B, dim).  Callers pass ``cfg_scale - 1``."""
    w = jnp.atleast_1d(jnp.asarray(w, jnp.float32)) * 1000.0
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / (half - 1))
    args = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ------------------------------------------------------------- architecture plan
def encoder_plan(cfg: UNetConfig) -> List[dict]:
    """Stage descriptors mirroring diffusion.py:543-575."""
    stages = [{"kind": "conv_in"}]
    c_prev = cfg.model_channels
    for i, c in enumerate(cfg.level_channels):
        for _ in range(cfg.num_res_blocks):
            stages.append({"kind": "block", "c_in": c_prev, "c_out": c,
                           "attn": cfg.attn_levels[i],
                           "depth": cfg.depth_for(i)})
            c_prev = c
        if i < len(cfg.ch_mults) - 1:
            stages.append({"kind": "down", "c": c})
    return stages


def adapter_sites(cfg: UNetConfig, n_feats: int):
    """T2I-Adapter insertion plan over the encoder stage list (the
    diffusers ``down_intrablock_additional_residuals`` contract).

    Returns ``(pre, post, mid)``: ``pre`` maps encoder-stage index ->
    feature index for levels WITH attention (added after the level's last
    res/attn block, BEFORE its skip is recorded — diffusers adds inside
    ``CrossAttnDownBlock2D`` before ``output_states`` collects the hidden
    state); ``post`` for levels WITHOUT attention (added to the backbone
    only, AFTER the level's final stage — its downsample, or its last
    block at the bottom level — matching diffusers' ``sample += ...``
    after a plain ``DownBlock2D`` whose ``res_samples`` were already
    collected); ``mid`` is the feature index added after the bottleneck
    (SDXL ``full_adapter_xl``'s n_levels+1-th feature) or None."""
    n_levels = len(cfg.ch_mults)
    if n_feats not in (n_levels, n_levels + 1):
        raise ValueError(f"{n_feats} adapter features for a {n_levels}-level"
                         f" UNet (expected {n_levels} or {n_levels + 1})")
    pre, post = {}, {}
    idx = 0
    for lvl in range(n_levels):
        last_block = idx + cfg.num_res_blocks - 1
        has_down = lvl < n_levels - 1
        if cfg.attn_levels[lvl]:
            pre[last_block] = lvl
        else:
            post[last_block + 1 if has_down else last_block] = lvl
        idx = last_block + (2 if has_down else 1)
    return pre, post, (n_levels if n_feats == n_levels + 1 else None)


def decoder_plan(cfg: UNetConfig) -> List[dict]:
    """Stage descriptors mirroring diffusion.py:586-626, derived from the
    encoder skip stack rather than hard-coded channel lists."""
    skips = [cfg.model_channels]
    for st in encoder_plan(cfg)[1:]:
        skips.append(st["c_out"] if st["kind"] == "block" else st["c"])
    stages = []
    c_prev = cfg.level_channels[-1]
    for i in reversed(range(len(cfg.ch_mults))):
        c = cfg.level_channels[i]
        for j in range(cfg.num_res_blocks + 1):
            stages.append({
                "kind": "block",
                "c_in": c_prev + skips.pop(),
                "c_out": c,
                "attn": cfg.attn_levels[i],
                "depth": cfg.depth_for(i),
                "upsample": (j == cfg.num_res_blocks and i > 0),
            })
            c_prev = c
    assert not skips
    return stages


# ------------------------------------------------------------------ res block
def init_res_block(key, c_in: int, c_out: int, t_dim: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": norm.init(c_in, dtype),
        "conv1": conv.init(k1, c_in, c_out, 3, dtype=dtype),
        "time_proj": linear.init(k2, t_dim, c_out, dtype=dtype),
        "norm2": norm.init(c_out, dtype),
        "conv2": conv.init(k3, c_out, c_out, 3, dtype=dtype),
    }
    if c_in != c_out:
        p["shortcut"] = conv.init(k4, c_in, c_out, 1, dtype=dtype)
    return p


def apply_res_block(p, x, t_emb, groups: int, policy: Policy,
                    backend: str = "xla", quant: str = "none",
                    conv_backend: str = "xla"):
    """diffusion.py:83-209.  t_emb: (B, t_dim) or (1, t_dim) (broadcast).

    ``conv_backend="pallas"``: both GN->SiLU->conv halves run through the
    fused Pallas kernel (ops/pallas/conv.py) with the time-embedding add
    folded into the second half's affine — equivalent up to bf16 rounding
    of the (h + t) sum (opt-in; tests/test_pallas_conv.py).  Falls back to
    XLA when the shape is ineligible, under int8 quant, or in seamless-
    tiling mode (the kernel pads with zeros, not circularly).

    ``conv_backend="fold"``: XLA convs, but the GN normalize folds to a
    per-(B, C) affine applied in compute dtype
    (ops/norm.group_norm_silu_folded) — no fp32 full-tensor normalize
    intermediate; the temb add rides the second half's shift.
    """
    use_pallas = (conv_backend in ("pallas", "pallas_fold")
                  and quant == "none"
                  and not conv.circular_padding_active())
    if use_pallas:
        from ..ops.pallas import conv as pconv

        use_pallas = (
            pconv.eligible(x.shape, p["conv1"]["kernel"].shape,
                           x.dtype.itemsize)
            and pconv.eligible((*x.shape[:3], p["conv1"]["kernel"].shape[3]),
                               p["conv2"]["kernel"].shape, x.dtype.itemsize))
    if use_pallas:
        h = pconv.gn_silu_conv3x3(p["norm1"], p["conv1"], x, groups)
        t = linear.apply(p["time_proj"], silu(t_emb), policy)
        t = jnp.broadcast_to(t, (x.shape[0], t.shape[-1]))
        h = pconv.gn_silu_conv3x3(p["norm2"], p["conv2"], h, groups, temb=t)
    elif conv_backend in ("fold", "pallas_fold"):
        # pallas_fold reaches here only when the kernel was ineligible for
        # this block's shapes — fall back to the folded-XLA half
        h = norm.group_norm_silu_folded(p["norm1"], x, groups, policy=policy)
        h = conv.apply(p["conv1"], h, padding=1, policy=policy, quant=quant)
        t = linear.apply(p["time_proj"], silu(t_emb), policy)
        t = jnp.broadcast_to(t, (x.shape[0], t.shape[-1]))
        h = norm.group_norm_silu_folded(p["norm2"], h, groups, policy=policy,
                                        temb=t)
        h = conv.apply(p["conv2"], h, padding=1, policy=policy, quant=quant)
    else:
        h = norm.group_norm_silu(p["norm1"], x, groups, policy=policy,
                                 backend=backend)
        h = conv.apply(p["conv1"], h, padding=1, policy=policy, quant=quant)
        t = linear.apply(p["time_proj"], silu(t_emb), policy)
        h = h + t[:, None, None, :].astype(h.dtype)
        h = norm.group_norm_silu(p["norm2"], h, groups, policy=policy,
                                 backend=backend)
        h = conv.apply(p["conv2"], h, padding=1, policy=policy, quant=quant)
    res = conv.apply(p["shortcut"], x, policy=policy, quant=quant) \
        if "shortcut" in p else x
    return h + res


# ----------------------------------------------------------- transformer block
def _init_transformer_layer(ks, channels: int, d_context: int, dtype):
    """One self+cross+ff transformer layer (keys: 4-tuple)."""
    return {
        "ln1": norm.init(channels, dtype),
        "self_attn": attention.init(ks[0], 1, channels, in_bias=False, dtype=dtype),
        "ln2": norm.init(channels, dtype),
        "cross_attn": attention.init(ks[1], 1, channels, d_cross=d_context,
                                     in_bias=False, dtype=dtype),
        "ln3": norm.init(channels, dtype),
        "geglu_proj": linear.init(ks[2], channels, 8 * channels, dtype=dtype),
        "geglu_out": linear.init(ks[3], 4 * channels, channels, dtype=dtype),
    }


def init_attn_block(key, channels: int, d_context: int, dtype=jnp.float32,
                    depth: int = 1):
    """depth == 1: the SD-1.x/2.x flat layout (structure and key-split
    order frozen — full-size golden fingerprints derive from it).
    depth > 1 (SDXL): ``blocks`` = a list of stacked transformer layers."""
    if depth == 1:
        ks = jax.random.split(key, 6)
        return {
            "norm": norm.init(channels, dtype),
            "conv_in": conv.init(ks[0], channels, channels, 1, dtype=dtype),
            "ln1": norm.init(channels, dtype),
            "self_attn": attention.init(ks[1], 1, channels, in_bias=False, dtype=dtype),
            "ln2": norm.init(channels, dtype),
            "cross_attn": attention.init(ks[2], 1, channels, d_cross=d_context,
                                         in_bias=False, dtype=dtype),
            "ln3": norm.init(channels, dtype),
            "geglu_proj": linear.init(ks[3], channels, 8 * channels, dtype=dtype),
            "geglu_out": linear.init(ks[4], 4 * channels, channels, dtype=dtype),
            "conv_out": conv.init(ks[5], channels, channels, 1, dtype=dtype),
        }
    ks = jax.random.split(key, 2 + 4 * depth)
    return {
        "norm": norm.init(channels, dtype),
        "conv_in": conv.init(ks[0], channels, channels, 1, dtype=dtype),
        "blocks": [
            _init_transformer_layer(ks[2 + 4 * j: 2 + 4 * (j + 1)],
                                    channels, d_context, dtype)
            for j in range(depth)
        ],
        "conv_out": conv.init(ks[1], channels, channels, 1, dtype=dtype),
    }


def _proj1x1(p, x, policy: Policy, quant: str = "none"):
    """A 1x1-conv parameter applied as a matmul over the channel dim of
    (B, S, C) — identical math to the conv on NHWC."""
    if quant != "none":
        from ..ops import quant as quant_mod

        if quant_mod.matmul_wants_int8(quant, p["kernel"].shape[2]):
            return quant_mod.int8_linear(x, p["kernel"][0, 0],
                                         p.get("bias")).astype(
                policy.compute_dtype)
    k = p["kernel"][0, 0].astype(policy.compute_dtype)
    y = jnp.dot(x.astype(policy.compute_dtype), k)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def hypertile_sides(h: int, w: int, tile: int):
    """Largest divisors of (h, w) that are <= tile — the static tile sides
    (tfernd/HyperTile picks among divisors per step; one static choice
    keeps the graph shape fixed).  Returns None when the grid already fits
    a single tile (hypertile is then exact/off for this block).  An axis
    with no divisor in [2, tile] (e.g. a prime side) is left untiled —
    divisor 1 would mean 1-row strip "tiles", a far harsher approximation
    than upstream HyperTile intends; if neither axis tiles, returns None."""
    def side(n):
        for d in range(min(tile, n), 1, -1):
            if n % d == 0:
                return d
        return n  # no usable divisor: keep the full side (axis untiled)
    th, tw = side(h), side(w)
    return None if (th, tw) == (h, w) else (th, tw)


def hypertile_fold(t, h: int, w: int, th: int, tw: int):
    """(B, h*w, C) row-major tokens -> (B*nh*nw, th*tw, C) tile-local
    sequences (tiles raster-ordered, rows within a tile raster-ordered)."""
    n, _, c = t.shape
    nh, nw = h // th, w // tw
    t = t.reshape(n, nh, th, nw, tw, c).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(n * nh * nw, th * tw, c)


def hypertile_unfold(t, h: int, w: int, th: int, tw: int):
    """Inverse of :func:`hypertile_fold`."""
    nh, nw = h // th, w // tw
    n = t.shape[0] // (nh * nw)
    t = t.reshape(n, nh, nw, th, tw, -1).transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(n, h * w, t.shape[-1])


def apply_attn_block(p, x, context, n_heads: int, groups: int, policy: Policy,
                     *, backend: str = "xla", reference_quirks: bool = False,
                     fuse_qkv: bool = True, quant: str = "none",
                     sp_mesh=None, pag_self_attn: bool = False,
                     return_self_probs: bool = False, ip=None, tome=None,
                     hypertile=None, ref=None, ref_key: str = None,
                     fold_norms: bool = False):
    """diffusion.py:212-381.

    The whole block runs in flattened (B, HW, C) form — one reshape at each
    end, with the 1x1 convs (proj_in/proj_out) as channel matmuls (identical
    math).  A single layout through the block measured ~5% off the whole
    UNet forward vs reshaping around NHWC convs, which forced XLA into
    layout-converting fusions around every residual add
    (benchmarks/exp_attn_variants2.py)."""
    n, h, w, c = x.shape
    y0 = x.reshape(n, h * w, c)
    # conv_backend="fold": every norm in the block applies its normalize
    # as a compute-dtype affine (fp32 stats unchanged) — ops/norm.py
    if fold_norms:
        ln = lambda pp, t: norm.layer_norm_folded(pp, t, policy=policy)  # noqa: E731
        y = norm.group_norm_silu_folded(p["norm"], y0, groups,
                                        policy=policy, apply_silu=False)
    else:
        ln = lambda pp, t: norm.layer_norm(pp, t, policy=policy)  # noqa: E731
        y = norm.group_norm_silu(p["norm"], y0, groups, policy=policy,
                                 backend=backend, apply_silu=False)
    y = _proj1x1(p["conv_in"], y, policy, quant)

    # ToMe (ops/tome.py): static merge plan for this block's grid; only
    # blocks at/above the token threshold merge, and the SP shard_map
    # path keeps its full token set (the pipeline rejects the combo)
    tome_plan = None
    if tome is not None and sp_mesh is None:
        ratio, sx, sy, min_tokens = tome
        if h * w >= min_tokens and h % sy == 0 and w % sx == 0:
            from ..ops import tome as tome_mod

            dst_i, src_i, t_r = tome_mod.plan(h, w, sx, sy, ratio)
            if t_r > 0:
                tome_plan = (tome_mod, dst_i, src_i, t_r)

    # Hypertile (models/config.with_hypertile): tile-local self-attention
    # for big grids; mutually exclusive with ToMe at a given block (ToMe
    # wins — both reduce the same attn1 cost)
    ht_plan = None
    if hypertile is not None and sp_mesh is None and tome_plan is None:
        ht_tile, ht_min = hypertile
        if h * w >= ht_min:
            ht_plan = hypertile_sides(h, w, ht_tile)

    # depth-1 blocks keep the flat SD-1.x layout; SDXL-style blocks carry
    # a "blocks" list of stacked transformer layers
    self_probs = None
    for li, lp in enumerate(p.get("blocks", [p])):
        t = ln(lp["ln1"], y)
        if pag_self_attn:
            # PAG perturbed branch: identity attention map (every token
            # attends to itself) in this block's self-attention layers
            y = y + attention.apply_identity(lp["self_attn"], t,
                                             policy=policy, quant=quant)
        elif return_self_probs and li == 0:
            # SAG attention-map capture: the first transformer layer's
            # self-attention probabilities (diffusers hooks
            # transformer_blocks[0].attn1)
            a, self_probs = attention.apply(
                lp["self_attn"], t, n_heads=n_heads, backend=backend,
                policy=policy, fuse=fuse_qkv, quant=quant,
                return_probs=True)
            y = y + a
        elif tome_plan is not None:
            # merge the redundant tokens, attend over the reduced
            # sequence, broadcast outputs back (tomesd's attn1 patch)
            tome_mod, dst_i, src_i, t_r = tome_plan
            tm, t_info = tome_mod.merge(t, dst_i, src_i, t_r)
            a = attention.apply(lp["self_attn"], tm, n_heads=n_heads,
                                backend=backend, policy=policy,
                                fuse=fuse_qkv, quant=quant)
            y = y + tome_mod.unmerge(a, t_info)
        elif ref is not None:
            # reference-only attention (the A1111 ControlNet "reference"
            # preprocessor): "capture" banks this layer's pre-attention
            # hidden states; "read" attends over [own, banked reference]
            # tokens, with style_fidelity lerping the masked lanes
            # (uncond, under CFG) back toward plain self-attention
            mode, bank = ref[0], ref[1]
            lkey = f"{ref_key}_{li}"
            if mode == "capture":
                bank[lkey] = t
                y = y + attention.apply(lp["self_attn"], t,
                                        n_heads=n_heads, backend=backend,
                                        policy=policy, fuse=fuse_qkv,
                                        quant=quant)
            else:
                _, _, fidelity, plain_mask = ref
                t_kv = jnp.concatenate([t, bank[lkey].astype(t.dtype)],
                                       axis=1)
                a_ref = attention.apply(lp["self_attn"], t, t_kv,
                                        n_heads=n_heads, backend=backend,
                                        policy=policy, fuse=False,
                                        quant=quant)
                if plain_mask is not None:
                    a_plain = attention.apply(
                        lp["self_attn"], t, n_heads=n_heads,
                        backend=backend, policy=policy, fuse=fuse_qkv,
                        quant=quant)
                    mix = (fidelity * plain_mask)[:, None, None] \
                        .astype(a_ref.dtype)
                    a_ref = a_plain * mix + a_ref * (1.0 - mix)
                y = y + a_ref
        elif ht_plan is not None:
            # Hypertile: fold non-overlapping latent tiles into the batch
            # axis — each tile attends only to itself
            th, tw = ht_plan
            a = attention.apply(lp["self_attn"],
                                hypertile_fold(t, h, w, th, tw),
                                n_heads=n_heads, backend=backend,
                                policy=policy, fuse=fuse_qkv, quant=quant)
            y = y + hypertile_unfold(a, h, w, th, tw)
        else:
            y = y + attention.apply(lp["self_attn"], t, n_heads=n_heads,
                                    backend=backend, policy=policy,
                                    fuse=fuse_qkv, quant=quant,
                                    sp_mesh=sp_mesh)
        t = ln(lp["ln2"], y)
        # IP-Adapter decoupled attention: ip = (per-layer param list,
        # image tokens, traced scale); each stacked transformer layer has
        # its own to_k_ip/to_v_ip (ops/attention.apply)
        ip_li = None if ip is None else (ip[0][li], ip[1], ip[2])
        y = y + attention.apply(lp["cross_attn"], t, context,
                                n_heads=n_heads, backend=backend,
                                policy=policy, fuse=fuse_qkv, quant=quant,
                                ip=ip_li)
        t = ln(lp["ln3"], y)
        t = geglu(linear.apply(lp["geglu_proj"], t, policy, quant),
                  reference_quirks)
        y = y + linear.apply(lp["geglu_out"], t, policy, quant)

    y = _proj1x1(p["conv_out"], y, policy, quant) + y0
    if return_self_probs:
        return y.reshape(n, h, w, c), self_probs
    return y.reshape(n, h, w, c)


# ----------------------------------------------------------------- full UNet
def init(key, cfg: UNetConfig, dtype=jnp.float32):
    t_dim = cfg.time_embed_dim
    k_t, k_cin, k_enc, k_mid, k_dec, k_out = jax.random.split(key, 6)
    params = {
        "time_embed": {
            "fc1": linear.init(jax.random.fold_in(k_t, 0), cfg.model_channels, t_dim, dtype=dtype),
            "fc2": linear.init(jax.random.fold_in(k_t, 1), t_dim, t_dim, dtype=dtype),
        },
        "conv_in": conv.init(k_cin, cfg.in_channels, cfg.model_channels, 3, dtype=dtype),
    }
    if cfg.time_cond_dim:
        # LCM guidance embedding projection (bias-free, diffusers
        # time_embedding.cond_proj) — added to the sinusoidal t_emb
        params["time_embed"]["cond_proj"] = linear.init(
            jax.random.fold_in(k_t, 4), cfg.time_cond_dim,
            cfg.model_channels, bias=False, dtype=dtype)
    if cfg.add_embed_dim:
        # SDXL added conditioning (pooled text + size ids) -> time embedding
        params["add_embed"] = {
            "fc1": linear.init(jax.random.fold_in(k_t, 2), cfg.add_embed_dim,
                               t_dim, dtype=dtype),
            "fc2": linear.init(jax.random.fold_in(k_t, 3), t_dim, t_dim,
                               dtype=dtype),
        }

    enc = []
    for i, st in enumerate(encoder_plan(cfg)[1:]):
        k = jax.random.fold_in(k_enc, i)
        if st["kind"] == "down":
            enc.append({"down": conv.init(k, st["c"], st["c"], 3, dtype=dtype)})
        else:
            stage = {"res": init_res_block(jax.random.fold_in(k, 0), st["c_in"],
                                           st["c_out"], t_dim, dtype)}
            if st["attn"]:
                stage["attn"] = init_attn_block(jax.random.fold_in(k, 1),
                                                st["c_out"], cfg.d_context,
                                                dtype, depth=st["depth"])
            enc.append(stage)
    params["encoder"] = enc

    c_mid = cfg.level_channels[-1]
    params["bottleneck"] = {
        "res1": init_res_block(jax.random.fold_in(k_mid, 0), c_mid, c_mid, t_dim, dtype),
        "attn": init_attn_block(jax.random.fold_in(k_mid, 1), c_mid,
                                cfg.d_context, dtype,
                                depth=cfg.depth_for(len(cfg.ch_mults) - 1)),
        "res2": init_res_block(jax.random.fold_in(k_mid, 2), c_mid, c_mid, t_dim, dtype),
    }

    dec = []
    for i, st in enumerate(decoder_plan(cfg)):
        k = jax.random.fold_in(k_dec, i)
        stage = {"res": init_res_block(jax.random.fold_in(k, 0), st["c_in"],
                                       st["c_out"], t_dim, dtype)}
        if st["attn"]:
            stage["attn"] = init_attn_block(jax.random.fold_in(k, 1),
                                            st["c_out"], cfg.d_context,
                                            dtype, depth=st["depth"])
        if st["upsample"]:
            stage["upsample"] = conv.init(jax.random.fold_in(k, 2), st["c_out"],
                                          st["c_out"], 3, dtype=dtype)
        dec.append(stage)
    params["decoder"] = dec

    params["norm_out"] = norm.init(cfg.model_channels, dtype)
    params["conv_out"] = conv.init(k_out, cfg.model_channels, cfg.out_channels, 3, dtype=dtype)
    return params


def _fourier_lowpass_scale(x, scale: float, threshold: int = 1):
    """FreeU's spectral modulation: scale the lowest-frequency band of the
    (NHWC) feature map by ``scale`` — a 2*threshold-wide box around DC in
    the centered 2-D spectrum.  fp32 FFT (XLA lowers complex FFT natively
    on TPU), cast back to the input dtype."""
    h, w = x.shape[1], x.shape[2]
    f = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    f = jnp.fft.fftshift(f, axes=(1, 2))
    mask = np.ones((h, w), np.float32)
    crow, ccol = h // 2, w // 2
    mask[max(crow - threshold, 0):crow + threshold,
         max(ccol - threshold, 0):ccol + threshold] = scale
    f = f * jnp.asarray(mask)[None, :, :, None]
    f = jnp.fft.ifftshift(f, axes=(1, 2))
    out = jnp.fft.ifftn(f, axes=(1, 2)).real
    return out.astype(x.dtype)


def adain_transform(xf, mean, var, m_ref, v_ref, fidelity, plain_mask):
    """The reference_adain read transform, exactly the published formula
    (diffusers community stable_diffusion_reference):
    ``x_uc = (x - mean)/max(var,1e-6)**.5 * max(var_ref,1e-6)**.5 + mean_ref``
    then masked lanes lerp toward plain: ``fidelity*x_c + (1-fidelity)*x_uc``
    with ``x_c = x`` on masked lanes, ``x_uc`` elsewhere.  All fp32;
    (mean, var) are the per-sample per-channel spatial stats of ``xf``."""
    x_ad = (xf - mean) / jnp.sqrt(jnp.maximum(var, 1e-6)) \
        * jnp.sqrt(jnp.maximum(v_ref, 1e-6)) + m_ref
    if plain_mask is not None:
        mix = (fidelity * plain_mask)[:, None, None, None] \
            .astype(jnp.float32)
        x_ad = xf * mix + x_ad * (1.0 - mix)
    return x_ad


def apply(params, latents, context, t, cfg: UNetConfig, policy: Policy = FP32,
          *, attention_backend: str = "xla", reference_quirks: bool = False,
          t_emb: Optional[jax.Array] = None, fuse_qkv: bool = True,
          quant: str = "none", sp_mesh=None, conv_backend: str = "xla",
          add_cond: Optional[jax.Array] = None, control=None,
          adapter=None, t_cond: Optional[jax.Array] = None,
          return_cache: bool = False, cache=None, pag: bool = False,
          return_mid_attn: bool = False, ip=None, ref=None, ref_adain=None,
          motion=None, frames: int = None):
    """latents: (B, h, w, in_ch); context: (B, S, d_context); t: scalar timestep.

    Returns predicted noise (B, h, w, out_ch).

    ``quant``: dynamic w8a8 int8 for wide contractions ("wide": only
    K >= 1280 matmuls/1x1s; "conv": additionally every 3x3 conv, whose
    effective K = 9·C >= 2880 at all levels).  See ops/quant.py.

    ``control``: ControlNet residuals ``{"down": [one per skip], "mid": r}``
    (models/controlnet.py) — added to the skip connections and the
    bottleneck output, the diffusers ``ControlNetModel`` contract.

    ``adapter``: T2I-Adapter features (models/t2i_adapter.py, pre-scaled;
    n_levels of them, or n_levels+1 for SDXL's full_adapter_xl whose last
    feature lands after the bottleneck) — inserted per the diffusers
    ``down_intrablock_additional_residuals`` contract, see
    :func:`adapter_sites`.

    ``pag=True`` runs the PERTURBED branch of Perturbed-Attention Guidance
    (Ahn et al. 2024): the mid-block self-attention layers use an identity
    attention map (diffusers' default ``pag_applied_layers=["mid"]``).

    ``ip``: IP-Adapter conditioning — ``(layers, tokens, scale)`` where
    ``layers`` maps position-stable keys ("enc_{stage}_{layer}" /
    "dec_{stage}_{layer}" / "mid_{layer}", weights/ip_adapter.py) to
    to_k_ip/to_v_ip params, ``tokens`` is the (B, n_tok, d_context)
    projected image-prompt context and ``scale`` the traced strength;
    every cross-attention layer runs the decoupled image attention.

    ``ref`` / ``ref_adain``: reference-only guidance (training-free; the
    A1111 ControlNet "reference" preprocessor family).  ``ref`` banks/reads
    every self-attention's pre-attention hidden states (reference_attn);
    ``ref_adain`` banks/reads per-sample per-channel spatial (mean, var)
    after every encoder/decoder res(+attn) stage and the bottleneck — the
    diffusers community stable_diffusion_reference gn-hook sites.  Both
    take ``("capture", bank)`` or ``("read", bank, fidelity, plain_mask)``.

    DeepCache (Ma et al. 2023) support: ``return_cache=True`` additionally
    returns the backbone feature entering the SHALLOWEST decoder level;
    passing that array back as ``cache`` runs only the shallow slice
    (conv_in + level-0 encoder blocks + last decoder level + head),
    substituting the cached deep feature — with identical inputs the
    result is exactly the full forward (tests/test_deepcache.py).
    """
    if return_mid_attn and (cache is not None or return_cache):
        raise ValueError("return_mid_attn (SAG) is incompatible with "
                         "DeepCache (the shallow step skips the mid block)")
    if t_emb is None:
        t_emb = timestep_embedding(t, cfg.model_channels)
    if t_cond is not None:
        # LCM embedded guidance (guidance_scale_embedding output) joins the
        # sinusoidal embedding before the time MLP
        t_emb = t_emb + linear.apply(params["time_embed"]["cond_proj"],
                                     t_cond.astype(policy.compute_dtype),
                                     policy)
    t_emb = linear.apply(params["time_embed"]["fc1"], t_emb, policy)
    t_emb = linear.apply(params["time_embed"]["fc2"], silu(t_emb), policy)
    # fused conv kernel is globally off under sequence parallelism: GSPMD
    # cannot spatially partition the opaque pallas_call (parallel/sp.py
    # relies on conv halo propagation)
    rb_conv_backend = "xla" if sp_mesh is not None else conv_backend
    # "fold" also switches the transformer blocks' GN/LN normalize applies
    # to compute-dtype affines (210 of SDXL's 233 norm-stat convert_reduce
    # instances are these LNs — RESULTS.md "SDXL trace")
    fold_norms = rb_conv_backend in ("fold", "pallas_fold")
    if add_cond is not None:
        # SDXL: emb = time_emb + add_embedding(concat(pooled, size_embs))
        a = linear.apply(params["add_embed"]["fc1"],
                         add_cond.astype(policy.compute_dtype), policy)
        t_emb = t_emb + linear.apply(params["add_embed"]["fc2"], silu(a),
                                     policy)

    def ip_for(key_prefix, attn_params):
        """Per-block IP layer params, addressed by stable position keys so
        partial forwards (DeepCache's shallow slice) stay aligned."""
        if ip is None:
            return None
        depth = len(attn_params.get("blocks", [None]))
        return ([ip[0][f"{key_prefix}_{li}"] for li in range(depth)],
                ip[1], ip[2])

    def adain_site(x, key):
        """Reference-only AdaIN banking site (the A1111 ControlNet
        "reference_adain" preprocessor / diffusers community
        stable_diffusion_reference gn hooks): in capture mode bank this
        feature map's per-sample per-channel spatial (mean, var); in read
        mode re-normalize to the banked reference statistics, with
        ``fidelity`` lerping the masked (uncond) lanes back toward the
        untouched features.  Stats in fp32 (variance of bf16 activations
        is catastrophically cancellation-prone)."""
        if ref_adain is None:
            return x
        mode, bank = ref_adain[0], ref_adain[1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        if mode == "capture":
            bank[key] = (mean, var)
            return x
        _, _, fidelity, plain_mask = ref_adain
        m_ref, v_ref = bank[key]
        return adain_transform(xf, mean, var, m_ref, v_ref, fidelity,
                               plain_mask).astype(x.dtype)

    def block(stage, x, ip_key=None):
        x = apply_res_block(stage["res"], x, t_emb, cfg.groups, policy,
                            backend=attention_backend, quant=quant,
                            conv_backend=rb_conv_backend)
        if "attn" in stage:
            x = apply_attn_block(stage["attn"], x, context,
                                 cfg.heads_for(x.shape[-1]), cfg.groups,
                                 policy, backend=attention_backend,
                                 reference_quirks=reference_quirks,
                                 fuse_qkv=fuse_qkv, quant=quant,
                                 sp_mesh=sp_mesh, tome=cfg.tome,
                                 hypertile=cfg.hypertile,
                                 ip=ip_for(ip_key, stage["attn"]),
                                 ref=ref, ref_key=ip_key,
                                 fold_norms=fold_norms)
        if motion is not None and ip_key in motion:
            # AnimateDiff temporal module after the stage's (res+attn)
            # pair, BEFORE the skip is recorded (the UNet3D block order)
            from . import motion as motion_mod

            x = motion_mod.apply_motion(motion[ip_key], x, frames, policy)
        return x

    dec_per_level = cfg.num_res_blocks + 1
    n_dec = len(params["decoder"])
    x = conv.apply(params["conv_in"], latents.astype(policy.compute_dtype),
                   padding=1, policy=policy)
    skips = [x]
    enc = params["encoder"]
    if adapter is not None:
        ad_pre, ad_post, ad_mid = adapter_sites(cfg, len(adapter))
    if cache is None:
        for i, stage in enumerate(enc):
            if "down" in stage:
                # stride-2 symmetric pad=1 (diffusion.py:553 — differs from VAE!)
                x = conv.apply(stage["down"], x, stride=2, padding=1,
                               policy=policy, quant=quant)
            else:
                x = block(stage, x, f"enc_{i}")
                x = adain_site(x, f"enc_{i}")
                if adapter is not None and i in ad_pre:
                    x = x + adapter[ad_pre[i]].astype(x.dtype)
            skips.append(x)
            if adapter is not None and i in ad_post:
                # backbone-only (the recorded skip excludes the residual)
                x = x + adapter[ad_post[i]].astype(x.dtype)

        if control is not None:
            skips = [s + d.astype(s.dtype)
                     for s, d in zip(skips, control["down"])]

        mid = params["bottleneck"]
        x = apply_res_block(mid["res1"], x, t_emb, cfg.groups, policy,
                            backend=attention_backend, quant=quant,
                            conv_backend=rb_conv_backend)
        if return_mid_attn:
            x, mid_probs = apply_attn_block(
                mid["attn"], x, context, cfg.heads_for(x.shape[-1]),
                cfg.groups, policy, backend=attention_backend,
                reference_quirks=reference_quirks, fuse_qkv=fuse_qkv,
                quant=quant, pag_self_attn=pag, return_self_probs=True,
                tome=cfg.tome, hypertile=cfg.hypertile,
                ip=ip_for("mid", mid["attn"]),
                ref=ref, ref_key="mid", fold_norms=fold_norms)
        else:
            x = apply_attn_block(mid["attn"], x, context,
                                 cfg.heads_for(x.shape[-1]), cfg.groups,
                                 policy, backend=attention_backend,
                                 reference_quirks=reference_quirks,
                                 fuse_qkv=fuse_qkv, quant=quant,
                                 sp_mesh=sp_mesh, pag_self_attn=pag,
                                 tome=cfg.tome,
                                 hypertile=cfg.hypertile,
                                 ip=ip_for("mid", mid["attn"]),
                                 ref=ref, ref_key="mid",
                                 fold_norms=fold_norms)
        if motion is not None and "mid" in motion:
            # v2 checkpoints carry a bottleneck module (attn -> motion ->
            # res2, the UNetMidBlock3D order)
            from . import motion as motion_mod

            x = motion_mod.apply_motion(motion["mid"], x, frames, policy)
        x = apply_res_block(mid["res2"], x, t_emb, cfg.groups, policy,
                            backend=attention_backend, quant=quant,
                            conv_backend=rb_conv_backend)
        x = adain_site(x, "mid")
        if adapter is not None and ad_mid is not None:
            # full_adapter_xl's extra feature, before the ControlNet mid
            # residual (the diffusers forward order)
            x = x + adapter[ad_mid].astype(x.dtype)
        if control is not None:
            x = x + control["mid"].astype(x.dtype)
        dec_stages = list(enumerate(params["decoder"]))
    else:
        # DeepCache shallow step: only the level-0 encoder blocks (the
        # skips the shallowest decoder level consumes), deep UNet replaced
        # by the cached backbone feature.  Only a level-0 PRE site can fall
        # inside this slice (post sites land on the downsample — part of
        # the cached deep region), keeping the split exact.
        for i, stage in enumerate(enc[:cfg.num_res_blocks]):
            x = block(stage, x, f"enc_{i}")
            if adapter is not None and i in ad_pre:
                x = x + adapter[ad_pre[i]].astype(x.dtype)
            skips.append(x)
        if control is not None:  # zip stops at the shallow skips
            skips = [s + d.astype(s.dtype)
                     for s, d in zip(skips, control["down"])]
        x = cache.astype(policy.compute_dtype)
        dec_stages = list(enumerate(params["decoder"]))[-dec_per_level:]

    out_cache = None
    for si, stage in dec_stages:
        if return_cache and si == n_dec - dec_per_level:
            out_cache = x
        skip = skips.pop()
        if cfg.freeu is not None and si // dec_per_level < 2:
            # FreeU: boost the backbone's structural half-channels and
            # low-pass-attenuate the (noisy high-frequency) skip at the two
            # deepest decoder levels.  Neutral values short-circuit so
            # freeu=(1,1,1,1) stays bit-identical to off.
            lvl = si // dec_per_level
            b, s = cfg.freeu[lvl], cfg.freeu[2 + lvl]
            if b != 1.0:
                half = x.shape[-1] // 2
                x = x.at[..., :half].multiply(jnp.asarray(b, x.dtype))
            if s != 1.0:
                skip = _fourier_lowpass_scale(skip, s)
        x = jnp.concatenate([x, skip], axis=-1)
        x = block(stage, x, f"dec_{si}")
        x = adain_site(x, f"dec_{si}")
        if "upsample" in stage:
            x = upsample_nearest_2x(x)
            x = conv.apply(stage["upsample"], x, padding=1, policy=policy,
                           quant=quant)

    x = norm.group_norm_silu(params["norm_out"], x, cfg.groups, policy=policy,
                             backend=attention_backend)
    out = conv.apply(params["conv_out"], x, padding=1, policy=policy)
    if return_cache:
        return out, out_cache
    if return_mid_attn:
        return out, mid_probs
    return out


def deepcache_shape(cfg: UNetConfig, batch: int, h_lat: int, w_lat: int):
    """Shape of the DeepCache backbone feature (the carry in the compiled
    denoise loop): the shallowest decoder level runs at full latent
    resolution with the SECOND level's channel width (its input arrives
    through that level's upsample conv — decoder_plan c_prev)."""
    if len(cfg.ch_mults) < 2:
        raise ValueError("deepcache needs a UNet with >= 2 levels")
    return (batch, h_lat, w_lat, cfg.level_channels[1])
