"""IP-Adapter (Ye et al. 2023) weight ingestion.

No analog in ``/root/reference`` (text-only conditioning).  Behavior
target: the published h94/IP-Adapter checkpoints and diffusers'
``load_ip_adapter`` semantics —

  * ``image_proj``: a linear projection of the global CLIP image embedding
    to ``num_tokens`` (4) context tokens + LayerNorm
    (tencent IPAdapter ``ImageProjModel``),
  * ``ip_adapter``: per-cross-attention-layer ``to_k_ip``/``to_v_ip``
    (bias-free) weights, keyed by INTEGER ModuleList indices that follow
    torch's ``unet.attn_processors`` iteration order — down_blocks, then
    up_blocks, then mid_block (attribute registration order; diffusers'
    ``_load_ip_adapter_weights`` reproduces it, key ``2*j + 1`` for the
    j-th cross-attention layer).

The converter re-keys that flat order onto OUR UNet traversal
(``models/unet.py``): encoder stages == down_blocks (same order), decoder
stages == up_blocks (both deepest-first), bottleneck == mid_block.  Keys
are position-stable strings ("enc_{stage}_{layer}", "dec_{stage}_{layer}",
"mid_{layer}") so partial forwards (DeepCache's shallow slice) address the
right weights.

Also here: the HF ``CLIPVisionModelWithProjection`` state-dict converter
for the image encoder (models/clip_vision.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..models.config import UNetConfig
from ..models.clip_vision import CLIPVisionConfig
from ..models import unet as unet_mod


# --------------------------------------------------------------- layer plan
def ip_layer_plan(cfg: UNetConfig) -> List[str]:
    """Our cross-attention layer keys in the checkpoint's flat order
    (down_blocks, up_blocks, mid_block — see module docstring)."""
    plan: List[str] = []
    for i, st in enumerate(unet_mod.encoder_plan(cfg)[1:]):
        if st["kind"] == "block" and st["attn"]:
            plan += [f"enc_{i}_{li}" for li in range(st["depth"])]
    for i, st in enumerate(unet_mod.decoder_plan(cfg)):
        if st["attn"]:
            plan += [f"dec_{i}_{li}" for li in range(st["depth"])]
    plan += [f"mid_{li}"
             for li in range(cfg.depth_for(len(cfg.ch_mults) - 1))]
    return plan


def synthetic_ip_state(cfg: UNetConfig, n_tok: int = 4, embed_dim: int = 24,
                       seed: int = 0, flat: bool = False) -> Dict:
    """A random checkpoint-layout IP-Adapter state dict for the given UNet
    topology — the shapes (and flat-index keying) of a real h94 file, used
    by the test suite and the driver dryrun (no real weights on this host).

    ``flat=True`` emits the .safetensors single-namespace layout; default
    is the .bin two-dict layout."""
    rs = np.random.RandomState(seed)
    d_ctx = cfg.d_context
    proj = {"proj.weight": rs.randn(n_tok * d_ctx, embed_dim)
            .astype(np.float32),
            "proj.bias": rs.randn(n_tok * d_ctx).astype(np.float32),
            "norm.weight": rs.randn(d_ctx).astype(np.float32),
            "norm.bias": rs.randn(d_ctx).astype(np.float32)}
    # channel width per plan layer, from the same stage walk as ip_layer_plan
    widths: Dict[str, int] = {}
    for i, st in enumerate(unet_mod.encoder_plan(cfg)[1:]):
        if st["kind"] == "block" and st["attn"]:
            widths.update({f"enc_{i}_{li}": st["c_out"]
                           for li in range(st["depth"])})
    for i, st in enumerate(unet_mod.decoder_plan(cfg)):
        if st["attn"]:
            widths.update({f"dec_{i}_{li}": st["c_out"]
                           for li in range(st["depth"])})
    widths.update({f"mid_{li}": cfg.level_channels[-1]
                   for li in range(cfg.depth_for(len(cfg.ch_mults) - 1))})
    ada = {}
    for j, key in enumerate(ip_layer_plan(cfg)):
        c = widths[key]
        ada[f"{2 * j + 1}.to_k_ip.weight"] = rs.randn(c, d_ctx) \
            .astype(np.float32)
        ada[f"{2 * j + 1}.to_v_ip.weight"] = rs.randn(c, d_ctx) \
            .astype(np.float32)
    if flat:
        out = {f"image_proj.{k}": v for k, v in proj.items()}
        out.update({f"ip_adapter.{k}": v for k, v in ada.items()})
        return out
    return {"image_proj": proj, "ip_adapter": ada}


def _nest(state: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Accept the .bin layout ({"image_proj": {...}, "ip_adapter": {...}})
    or the flat .safetensors layout ("image_proj.proj.weight", ...)."""
    if "image_proj" in state and isinstance(state["image_proj"], dict):
        return {"image_proj": dict(state["image_proj"]),
                "ip_adapter": dict(state["ip_adapter"])}
    out: Dict[str, Dict[str, np.ndarray]] = {"image_proj": {},
                                             "ip_adapter": {}}
    for k, v in state.items():
        group, rest = k.split(".", 1)
        if group not in out:
            raise ValueError(f"unexpected IP-Adapter key group {group!r}")
        out[group][rest] = v
    return out


def convert_ip_adapter(state: Dict, cfg: UNetConfig) -> Dict:
    """Checkpoint state dict -> our pytree:

    ``{"image_proj": {"proj": linear, "norm": layer_norm},
       "layers": {key: {"k": {"kernel"}, "v": {"kernel"}}}}``

    Exact-coverage enforced in both directions (every checkpoint tensor
    consumed, every plan layer filled).
    """
    nested = _nest(state)
    proj_sd = nested["image_proj"]
    d_ctx = cfg.d_context
    if "latents" in proj_sd or any(k.startswith("layers.") for k in proj_sd):
        image_proj = _convert_resampler(proj_sd, d_ctx)
    else:
        want_proj = {"proj.weight", "proj.bias", "norm.weight", "norm.bias"}
        if set(proj_sd) != want_proj:
            raise ValueError(f"unexpected image_proj keys: "
                             f"{sorted(proj_sd)} (want {sorted(want_proj)})")
        w = np.asarray(proj_sd["proj.weight"], np.float32)
        if w.shape[0] % d_ctx:
            raise ValueError(f"image_proj out dim {w.shape[0]} not a "
                             f"multiple of d_context {d_ctx} (wrong "
                             "family?)")
        image_proj = {
            "proj": {"kernel": w.T.copy(),
                     "bias": np.asarray(proj_sd["proj.bias"], np.float32)},
            "norm": {"scale": np.asarray(proj_sd["norm.weight"],
                                         np.float32),
                     "bias": np.asarray(proj_sd["norm.bias"], np.float32)},
        }

    plan = ip_layer_plan(cfg)
    ada_sd = dict(nested["ip_adapter"])
    layers = {}
    for j, our_key in enumerate(plan):
        idx = 2 * j + 1
        lay = {}
        for kv in ("k", "v"):
            src = f"{idx}.to_{kv}_ip.weight"
            if src not in ada_sd:
                raise ValueError(
                    f"missing {src} — checkpoint has "
                    f"{len(ada_sd) // 2} cross-attn layers, the "
                    f"{type(cfg).__name__} plan expects {len(plan)} "
                    "(family mismatch?)")
            t = np.asarray(ada_sd.pop(src), np.float32)  # (channels, d_ctx)
            if t.shape[1] != d_ctx:
                raise ValueError(f"{src}: context dim {t.shape[1]} != "
                                 f"UNet d_context {d_ctx}")
            lay[kv] = {"kernel": t.T.copy()}
        layers[our_key] = lay
    if ada_sd:
        raise ValueError(f"unconsumed ip_adapter keys: "
                         f"{sorted(ada_sd)[:4]}...")
    return {"image_proj": image_proj, "layers": layers}


def _convert_resampler(sd: Dict[str, np.ndarray], d_ctx: int) -> Dict:
    """IP-Adapter-plus ``Resampler`` state dict -> our pytree
    (models/clip_vision.apply_resampler).  Exact coverage."""
    sd = dict(sd)

    def take(key):
        if key not in sd:
            raise ValueError(f"resampler image_proj is missing {key!r}")
        return np.asarray(sd.pop(key), np.float32)

    def take_lin(prefix, bias):
        p = {"kernel": take(prefix + ".weight").T.copy()}
        if bias:
            p["bias"] = take(prefix + ".bias")
        return p

    def take_ln(prefix):
        return {"scale": take(prefix + ".weight"),
                "bias": take(prefix + ".bias")}

    lat = take("latents")
    if lat.ndim == 3:  # stored with the broadcast batch dim (1, nq, dim)
        lat = lat[0]
    out = {
        "latents": lat,
        "proj_in": take_lin("proj_in", bias=True),
        "proj_out": take_lin("proj_out", bias=True),
        "norm_out": take_ln("norm_out"),
        "layers": [],
    }
    depth = 0
    while f"layers.{depth}.0.to_q.weight" in sd:
        i = depth
        out["layers"].append({
            # PerceiverAttention: norm1 normalizes x, norm2 the latents
            "ln_x": take_ln(f"layers.{i}.0.norm1"),
            "ln_lat": take_ln(f"layers.{i}.0.norm2"),
            "q": take_lin(f"layers.{i}.0.to_q", bias=False),
            "kv": take_lin(f"layers.{i}.0.to_kv", bias=False),
            "out": take_lin(f"layers.{i}.0.to_out", bias=False),
            # FeedForward Sequential: [0]=LN, [1]=Linear, [2]=GELU,
            # [3]=Linear (bias-free linears)
            "ff_ln": take_ln(f"layers.{i}.1.0"),
            "ff1": take_lin(f"layers.{i}.1.1", bias=False),
            "ff2": take_lin(f"layers.{i}.1.3", bias=False),
        })
        depth += 1
    if not out["layers"]:
        raise ValueError("resampler image_proj has no layers.*.0.to_q "
                         "keys")
    if sd:
        raise ValueError(f"unconsumed resampler keys: {sorted(sd)[:4]}...")
    if out["proj_out"]["kernel"].shape[1] != d_ctx:
        raise ValueError(
            f"resampler output dim {out['proj_out']['kernel'].shape[1]} "
            f"!= UNet d_context {d_ctx} (wrong family?)")
    return out


def num_image_tokens(ip_params, cfg: UNetConfig) -> int:
    """Static token count, derived from the projection shapes."""
    proj = ip_params["image_proj"]
    if "latents" in proj:  # plus (Resampler): one token per learned query
        return proj["latents"].shape[0]
    return proj["proj"]["kernel"].shape[1] // cfg.d_context


def load_ip_adapter(path: str, cfg: UNetConfig) -> Dict:
    """Load an IP-Adapter file (.bin torch pickle via the restricted
    unpickler, or .safetensors) and convert."""
    if path.endswith(".safetensors"):
        from .convert import load_state_dict

        return convert_ip_adapter(load_state_dict(path), cfg)
    from .ckpt_reader import load_torch_object

    return convert_ip_adapter(load_torch_object(path), cfg)


# ------------------------------------------------- CLIP vision state dicts
def convert_clip_vision(state: Dict[str, np.ndarray],
                        cfg: CLIPVisionConfig) -> Dict:
    """HF ``CLIPVisionModelWithProjection`` state dict -> our
    models/clip_vision.py pytree.  Exact coverage (position_ids buffers
    ignored)."""
    sd = {k: np.asarray(v) for k, v in state.items()
          if not k.endswith("position_ids")}

    def take(key):
        return np.asarray(sd.pop(key), np.float32)

    def take_linear(prefix):
        return {"kernel": take(prefix + ".weight").T.copy(),
                "bias": take(prefix + ".bias")}

    def take_ln(prefix):
        return {"scale": take(prefix + ".weight"),
                "bias": take(prefix + ".bias")}

    v = "vision_model."
    params = {
        "class_embedding": take(v + "embeddings.class_embedding").reshape(-1),
        # OIHW -> HWIO (bias-free patch conv)
        "patch_embedding": {"kernel": take(
            v + "embeddings.patch_embedding.weight")
            .transpose(2, 3, 1, 0).copy()},
        "position_embedding": take(v + "embeddings.position_embedding.weight"),
        "pre_ln": take_ln(v + "pre_layrnorm"),
        "layers": [],
        "post_ln": take_ln(v + "post_layernorm"),
        "projection": take("visual_projection.weight").T.copy(),
    }
    for i in range(cfg.n_layers):
        p = f"{v}encoder.layers.{i}."
        params["layers"].append({
            "ln1": take_ln(p + "layer_norm1"),
            "attn": {"q": take_linear(p + "self_attn.q_proj"),
                     "k": take_linear(p + "self_attn.k_proj"),
                     "v": take_linear(p + "self_attn.v_proj"),
                     "out": take_linear(p + "self_attn.out_proj")},
            "ln2": take_ln(p + "layer_norm2"),
            "fc1": take_linear(p + "mlp.fc1"),
            "fc2": take_linear(p + "mlp.fc2"),
        })
    if sd:
        raise ValueError(f"unconsumed CLIP-vision keys: {sorted(sd)[:4]}...")
    exp = cfg.n_positions
    got = params["position_embedding"].shape[0]
    if got != exp:
        raise ValueError(f"position embedding rows {got} != {exp} — config "
                         f"mismatch (image_size/patch_size)")
    return params


def load_clip_vision(path: str, cfg: CLIPVisionConfig) -> Dict:
    """Load an image-encoder weight file (.safetensors or torch .bin)."""
    if path.endswith(".safetensors"):
        from .convert import load_state_dict

        return convert_clip_vision(load_state_dict(path), cfg)
    from .ckpt_reader import load_torch_object

    return convert_clip_vision(load_torch_object(path), cfg)
