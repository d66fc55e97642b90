"""CLIP ViT-L/14 text encoder (functional JAX).

Behavior-parity target: ``/root/reference/sd/clip.py``.
  * token embedding + learned positional parameter (zeros-init in the
    reference, ``clip.py:36,63``) added directly.
  * 12 pre-norm blocks: LN -> causal self-attention -> residual;
    LN -> fc1 -> QuickGELU x*sigmoid(1.702x) (``clip.py:166``) -> fc2 ->
    residual (``clip.py:139-176``).
  * final LayerNorm (``clip.py:225,259``).
Output: (B, 77, 768) last hidden state — no projection head, no pooling.

Sequence length is 77, so attention here always uses the XLA backend
(flash buys nothing at S=77; parity path stays simple).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from ..ops import attention, linear, norm
from ..ops.act import quick_gelu
from .config import CLIPConfig


def init(key, cfg: CLIPConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.n_layers + 2)
    params = {
        "token_embedding": jax.random.normal(keys[0], (cfg.vocab_size, cfg.d_model), dtype) * 0.02,
        "position_embedding": jnp.zeros((cfg.max_len, cfg.d_model), dtype),
        "layers": [],
        "final_norm": norm.init(cfg.d_model, dtype),
    }
    for i in range(cfg.n_layers):
        ka, k1, k2 = jax.random.split(keys[i + 1], 3)
        params["layers"].append({
            "ln1": norm.init(cfg.d_model, dtype),
            "attn": attention.init(ka, cfg.n_heads, cfg.d_model, dtype=dtype),
            "ln2": norm.init(cfg.d_model, dtype),
            "fc1": linear.init(k1, cfg.d_model, cfg.d_ff, dtype=dtype),
            "fc2": linear.init(k2, cfg.d_ff, cfg.d_model, dtype=dtype),
        })
    if cfg.text_projection:
        # OpenCLIP pooled-text head (SDXL bigG): (d, d) projection applied
        # to the final-normed EOT token embedding
        params["text_projection"] = jax.random.normal(
            keys[-1], (cfg.d_model, cfg.d_model), dtype) * cfg.d_model**-0.5
    return params


def apply(params, tokens, cfg: CLIPConfig, policy: Policy = FP32,
          *, fuse_qkv: bool = True):
    """tokens: (B, max_len) int32 -> (B, max_len, d_model).

    cfg.stop_at_layer truncates the stack (SD-2.x penultimate-layer
    conditioning); cfg.hidden_act selects QuickGELU (SD-1.x) vs GELU
    (OpenCLIP).  ``fuse_qkv=False`` under tensor parallelism (see
    ops/attention.apply).
    """
    import jax.nn

    act = quick_gelu if cfg.hidden_act == "quick_gelu" else jax.nn.gelu
    n_run = cfg.n_layers if cfg.stop_at_layer is None else cfg.stop_at_layer
    x = params["token_embedding"][tokens] + params["position_embedding"][None]
    x = x.astype(policy.compute_dtype)
    for lp in params["layers"][:n_run]:
        h = norm.layer_norm(lp["ln1"], x, policy=policy)
        h = attention.apply(lp["attn"], h, n_heads=cfg.n_heads, causal=True,
                            backend="xla", policy=policy, fuse=fuse_qkv)
        x = x + h
        h = norm.layer_norm(lp["ln2"], x, policy=policy)
        h = linear.apply(lp["fc1"], h, policy)
        h = act(h)
        h = linear.apply(lp["fc2"], h, policy)
        x = x + h
    if cfg.stop_at_layer is not None and not cfg.penultimate_norm:
        return x  # SDXL contract: truncated hidden WITHOUT the final LN
    return norm.layer_norm(params["final_norm"], x, policy=policy)


def apply_with_pooled(params, tokens, cfg: CLIPConfig, policy: Policy = FP32,
                      *, fuse_qkv: bool = True):
    """(hidden, pooled) — the SDXL text-tower contract: ``hidden`` follows
    ``apply`` (penultimate, un-normed when cfg.penultimate_norm=False);
    ``pooled`` runs the FULL stack, final-norms, takes the EOT-token
    embedding (argmax of ids — the CLIP convention; eot is the largest id)
    and applies ``text_projection`` when present."""
    import dataclasses as _dc

    hidden = apply(params, tokens, cfg, policy, fuse_qkv=fuse_qkv)
    full = apply(params, tokens, _dc.replace(cfg, stop_at_layer=None),
                 policy, fuse_qkv=fuse_qkv)
    eot = jnp.argmax(tokens, axis=-1)  # (B,)
    pooled = jnp.take_along_axis(full, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = jnp.dot(pooled,
                         params["text_projection"].astype(pooled.dtype))
    return hidden, pooled
