"""ControlNet (lllyasviel) — spatial-conditioning side network.

The reference has no ControlNet; this implements the published architecture
(a trainable copy of the UNet encoder + bottleneck, a conditioning-image
"hint" encoder, and zero-initialized 1x1 projection convs) as a TPU-native
functional module.  Structure follows the CompVis checkpoint layout
(``control_model.*``: ``input_hint_block`` indices 0,2,..,14 with strides
1,1,2,1,2,1,2,1; ``zero_convs.{0..11}``; ``middle_block_out``), reusing the
UNet's own plan-driven blocks so every SD family (1.x/2.x/SDXL) gets a
matching ControlNet topology from its config.

Forward contract (mirrors diffusers ``ControlNetModel``):
  apply(params, latents, context, t, hint_features, cfg, ...) ->
      {"down": [r_0 .. r_11], "mid": r_mid}
added by the UNet to its skip connections and bottleneck output
(``unet.apply(control=...)``).  ``hint_features`` is the hint encoder's
output — time-independent, so the pipeline computes it ONCE per generation
(``encode_hint``) instead of once per denoise step.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from ..ops import conv, linear
from ..ops.act import silu
from . import unet as unet_mod
from .config import UNetConfig


# ------------------------------------------------------------- hint encoder
def hint_plan(cfg: UNetConfig, downsample_factor: int) -> List[Tuple[int, int, int]]:
    """[(c_in, c_out, stride), ...] for the conditioning embedder.

    The published SD ControlNet (VAE factor 8, k=3 downsamples) is
    conv(3,16,s1), conv(16,16,s1), then per downsample a stride-2 conv to
    the next width with a stride-1 conv after each but the last:
    16->32 s2, 32->32 s1, 32->96 s2, 96->96 s1, 96->256 s2 — followed by a
    zero-init conv(256, model_channels).  Scaled-down configs (tests) use
    the tail of the width ladder so the hint always lands on the latent
    grid."""
    k = downsample_factor.bit_length() - 1  # log2
    widths = [16, 32, 96, 256][-(k + 1):]
    plan = [(3, widths[0], 1), (widths[0], widths[0], 1)]
    for i in range(1, len(widths)):
        plan.append((widths[i - 1], widths[i], 2))
        if i < len(widths) - 1:
            plan.append((widths[i], widths[i], 1))
    plan.append((widths[-1], cfg.model_channels, 1))  # zero-init projection
    return plan


def init(key, cfg: UNetConfig, downsample_factor: int = 8, dtype=jnp.float32):
    """Fresh ControlNet: the copied encoder is randomly initialized but all
    zero convs (and the final hint conv) are zeros, so a fresh ControlNet is
    an exact no-op on the UNet — the published training-init property."""
    k_u, k_h = jax.random.split(key)
    base = unet_mod.init(k_u, cfg, dtype)
    params = {
        "time_embed": base["time_embed"],
        "conv_in": base["conv_in"],
        "encoder": base["encoder"],
        "bottleneck": base["bottleneck"],
    }
    if cfg.add_embed_dim:
        params["add_embed"] = base["add_embed"]

    plan = hint_plan(cfg, downsample_factor)
    hint = []
    for j, (ci, co, _s) in enumerate(plan):
        kj = jax.random.fold_in(k_h, j)
        p = conv.init(kj, ci, co, 3, dtype=dtype)
        if j == len(plan) - 1:
            p = {"kernel": jnp.zeros_like(p["kernel"]),
                 "bias": jnp.zeros_like(p["bias"])}
        hint.append(p)
    params["hint_block"] = hint

    n_skips = len(unet_mod.encoder_plan(cfg))
    c_prev = cfg.model_channels
    zero = []
    chans = [cfg.model_channels]
    for st in unet_mod.encoder_plan(cfg)[1:]:
        chans.append(st["c_out"] if st["kind"] == "block" else st["c"])
    assert len(chans) == n_skips
    for c in chans:
        zero.append({"kernel": jnp.zeros((1, 1, c, c), dtype),
                     "bias": jnp.zeros((c,), dtype)})
    params["zero_convs"] = zero
    c_mid = cfg.level_channels[-1]
    params["mid_out"] = {"kernel": jnp.zeros((1, 1, c_mid, c_mid), dtype),
                         "bias": jnp.zeros((c_mid,), dtype)}
    return params


def encode_hint(params, hint, cfg: UNetConfig, downsample_factor: int,
                policy: Policy = FP32):
    """Conditioning image (B, H, W, 3) in [0, 1] -> (B, h, w, model_channels).

    Time-independent: call once per generation, not per step."""
    plan = hint_plan(cfg, downsample_factor)
    x = hint.astype(policy.compute_dtype)
    for j, (_ci, _co, s) in enumerate(plan):
        x = conv.apply(params["hint_block"][j], x, stride=s, padding=1,
                       policy=policy)
        if j < len(plan) - 1:
            x = silu(x)
    return x


def apply(params, latents, context, t, hint_features, cfg: UNetConfig,
          policy: Policy = FP32, *, attention_backend: str = "xla",
          fuse_qkv: bool = True, conditioning_scale: float = 1.0,
          add_cond: Optional[jax.Array] = None, conv_backend: str = "xla"):
    """-> {"down": [12 residuals aligned with the UNet skip stack],
           "mid": bottleneck residual}, each scaled by conditioning_scale."""
    t_emb = unet_mod.timestep_embedding(t, cfg.model_channels)
    t_emb = linear.apply(params["time_embed"]["fc1"], t_emb, policy)
    t_emb = linear.apply(params["time_embed"]["fc2"], silu(t_emb), policy)
    if add_cond is not None:
        a = linear.apply(params["add_embed"]["fc1"],
                         add_cond.astype(policy.compute_dtype), policy)
        t_emb = t_emb + linear.apply(params["add_embed"]["fc2"], silu(a),
                                     policy)

    def zconv(p, x):
        k = p["kernel"][0, 0].astype(policy.compute_dtype)
        return x.astype(policy.compute_dtype) @ k + p["bias"].astype(
            policy.compute_dtype)

    x = conv.apply(params["conv_in"], latents.astype(policy.compute_dtype),
                   padding=1, policy=policy)
    x = x + hint_features.astype(x.dtype)
    downs = [zconv(params["zero_convs"][0], x)]
    for i, stage in enumerate(params["encoder"]):
        if "down" in stage:
            x = conv.apply(stage["down"], x, stride=2, padding=1,
                           policy=policy)
        else:
            x = unet_mod.apply_res_block(stage["res"], x, t_emb, cfg.groups,
                                         policy, backend=attention_backend,
                                         conv_backend=conv_backend)
            if "attn" in stage:
                x = unet_mod.apply_attn_block(
                    stage["attn"], x, context, cfg.heads_for(x.shape[-1]),
                    cfg.groups, policy, backend=attention_backend,
                    fuse_qkv=fuse_qkv)
        downs.append(zconv(params["zero_convs"][i + 1], x))

    mid = params["bottleneck"]
    x = unet_mod.apply_res_block(mid["res1"], x, t_emb, cfg.groups, policy,
                                 backend=attention_backend,
                                 conv_backend=conv_backend)
    x = unet_mod.apply_attn_block(mid["attn"], x, context,
                                  cfg.heads_for(x.shape[-1]), cfg.groups,
                                  policy, backend=attention_backend,
                                  fuse_qkv=fuse_qkv)
    x = unet_mod.apply_res_block(mid["res2"], x, t_emb, cfg.groups, policy,
                                 backend=attention_backend,
                                 conv_backend=conv_backend)
    mid_r = zconv(params["mid_out"], x)

    s = jnp.asarray(conditioning_scale, policy.compute_dtype)
    return {"down": [d * s for d in downs], "mid": mid_r * s}
