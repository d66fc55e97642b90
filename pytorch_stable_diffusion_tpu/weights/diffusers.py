"""Diffusers-format checkpoint ingestion (capability beyond the reference).

The reference only reads the original CompVis single-file `.ckpt`
(``sd/model_converter.py``); modern SD-1.5 distributions ship the diffusers
layout instead — separate ``unet/``, ``vae/``, ``text_encoder/`` weight
files with different key names.  Rules are generated from the architecture
config exactly like weights/convert.py, with the same two-way coverage
guarantee (tests round-trip a synthetic diffusers state dict and cross-check
against the CompVis path).

Key-name correspondence (modern diffusers, Linear-based VAE attention):
  unet:  down_blocks.{l}.resnets/attentions/downsamplers, mid_block,
         up_blocks, time_embedding.linear_{1,2}, conv_in, conv_norm_out,
         conv_out; resnet fields norm1/conv1/time_emb_proj/norm2/conv2/
         conv_shortcut.
  vae:   encoder.down_blocks..., decoder.up_blocks... (decoder up_blocks are
         listed top-resolution-LAST, i.e. already in our processing order),
         mid_block.resnets.{0,1} + attentions.0 (group_norm, to_q/k/v,
         to_out.0 — Linear (C, C)), quant_conv, post_quant_conv.
  text_encoder: text_model.* — same structure as the CompVis CLIP subtree.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..models import unet as unet_mod
from ..models.config import SDConfig
from .convert import _FWD, _INV, Rule, _conv, _linear, _nest, _norm


# ------------------------------------------------------------------- UNet
def _res_rules(rules, src, dst, c_in, c_out):
    _norm(rules, f"{src}.norm1", f"{dst}/norm1")
    _conv(rules, f"{src}.conv1", f"{dst}/conv1")
    _linear(rules, f"{src}.time_emb_proj", f"{dst}/time_proj")
    _norm(rules, f"{src}.norm2", f"{dst}/norm2")
    _conv(rules, f"{src}.conv2", f"{dst}/conv2")
    if c_in != c_out:
        _conv(rules, f"{src}.conv_shortcut", f"{dst}/shortcut")


def _tx_layer_rules(rules, tb, ldst):
    _norm(rules, f"{tb}.norm1", f"{ldst}/ln1")
    for ours, theirs in (("q", "to_q"), ("k", "to_k"), ("v", "to_v")):
        _linear(rules, f"{tb}.attn1.{theirs}", f"{ldst}/self_attn/{ours}", bias=False)
        _linear(rules, f"{tb}.attn2.{theirs}", f"{ldst}/cross_attn/{ours}", bias=False)
    _linear(rules, f"{tb}.attn1.to_out.0", f"{ldst}/self_attn/out")
    _linear(rules, f"{tb}.attn2.to_out.0", f"{ldst}/cross_attn/out")
    _norm(rules, f"{tb}.norm2", f"{ldst}/ln2")
    _norm(rules, f"{tb}.norm3", f"{ldst}/ln3")
    _linear(rules, f"{tb}.ff.net.0.proj", f"{ldst}/geglu_proj")
    _linear(rules, f"{tb}.ff.net.2", f"{ldst}/geglu_out")


def _tx_rules(rules, src, dst, depth: int = 1):
    _norm(rules, f"{src}.norm", f"{dst}/norm")
    _conv(rules, f"{src}.proj_in", f"{dst}/conv_in")
    if depth == 1:  # flat SD-1.x/2.x layout
        _tx_layer_rules(rules, f"{src}.transformer_blocks.0", dst)
    else:  # SDXL-style stacked layers
        for j in range(depth):
            _tx_layer_rules(rules, f"{src}.transformer_blocks.{j}",
                            f"{dst}/blocks/{j}")
    _conv(rules, f"{src}.proj_out", f"{dst}/conv_out")


def unet_rules(cfg: SDConfig) -> List[Rule]:
    u = cfg.unet
    rules: List[Rule] = []
    _linear(rules, "time_embedding.linear_1", "time_embed/fc1")
    _linear(rules, "time_embedding.linear_2", "time_embed/fc2")
    if u.time_cond_dim:
        # LCM guidance projection (time_cond_proj_dim checkpoints)
        _linear(rules, "time_embedding.cond_proj", "time_embed/cond_proj",
                bias=False)
    _conv(rules, "conv_in", "conv_in")

    # our flat encoder-stage list <-> diffusers down_blocks.{l}.{resnets,...}
    res_i = {l: 0 for l in range(len(u.ch_mults))}
    level = 0
    for i, st in enumerate(unet_mod.encoder_plan(u)[1:]):
        dst = f"encoder/{i}"
        if st["kind"] == "down":
            _conv(rules, f"down_blocks.{level}.downsamplers.0.conv", f"{dst}/down")
            level += 1
        else:
            r = res_i[level]
            _res_rules(rules, f"down_blocks.{level}.resnets.{r}", f"{dst}/res",
                       st["c_in"], st["c_out"])
            if st["attn"]:
                _tx_rules(rules, f"down_blocks.{level}.attentions.{r}",
                          f"{dst}/attn", depth=st.get("depth", 1))
            res_i[level] += 1

    c_mid = u.level_channels[-1]
    _res_rules(rules, "mid_block.resnets.0", "bottleneck/res1", c_mid, c_mid)
    _tx_rules(rules, "mid_block.attentions.0", "bottleneck/attn",
              depth=u.depth_for(len(u.ch_mults) - 1))
    _res_rules(rules, "mid_block.resnets.1", "bottleneck/res2", c_mid, c_mid)

    per_level = u.num_res_blocks + 1
    for j, st in enumerate(unet_mod.decoder_plan(u)):
        dst = f"decoder/{j}"
        l, r = divmod(j, per_level)
        _res_rules(rules, f"up_blocks.{l}.resnets.{r}", f"{dst}/res",
                   st["c_in"], st["c_out"])
        if st["attn"]:
            _tx_rules(rules, f"up_blocks.{l}.attentions.{r}", f"{dst}/attn",
                      depth=st.get("depth", 1))
        if st["upsample"]:
            _conv(rules, f"up_blocks.{l}.upsamplers.0.conv", f"{dst}/upsample")

    if u.add_embed_dim:
        # SDXL added conditioning MLP (diffusers: add_embedding.linear_{1,2})
        _linear(rules, "add_embedding.linear_1", "add_embed/fc1")
        _linear(rules, "add_embedding.linear_2", "add_embed/fc2")

    _norm(rules, "conv_norm_out", "norm_out")
    _conv(rules, "conv_out", "conv_out")
    return rules


# -------------------------------------------------------------------- VAE
def _vae_res_rules(rules, src, dst, c_in, c_out):
    _norm(rules, f"{src}.norm1", f"{dst}/norm1")
    _conv(rules, f"{src}.conv1", f"{dst}/conv1")
    _norm(rules, f"{src}.norm2", f"{dst}/norm2")
    _conv(rules, f"{src}.conv2", f"{dst}/conv2")
    if c_in != c_out:
        _conv(rules, f"{src}.conv_shortcut", f"{dst}/shortcut")


def _vae_mid_rules(rules, src, dst, ch):
    _vae_res_rules(rules, f"{src}.resnets.0", f"{dst}/res1", ch, ch)
    a = f"{src}.attentions.0"
    _norm(rules, f"{a}.group_norm", f"{dst}/attn/norm")
    for ours, theirs in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                         ("out", "to_out.0")):
        _linear(rules, f"{a}.{theirs}", f"{dst}/attn/attn/{ours}")
    _vae_res_rules(rules, f"{src}.resnets.1", f"{dst}/res2", ch, ch)


def vae_encoder_rules(cfg: SDConfig) -> List[Rule]:
    v = cfg.vae
    chs = v.level_channels
    rules: List[Rule] = []
    _conv(rules, "encoder.conv_in", "conv_in")
    c_prev = chs[0]
    for l, c in enumerate(chs):
        _vae_res_rules(rules, f"encoder.down_blocks.{l}.resnets.0",
                       f"down/{l}/res/0", c_prev, c)
        _vae_res_rules(rules, f"encoder.down_blocks.{l}.resnets.1",
                       f"down/{l}/res/1", c, c)
        c_prev = c
        if l < len(chs) - 1:
            _conv(rules, f"encoder.down_blocks.{l}.downsamplers.0.conv",
                  f"down/{l}/downsample")
    _vae_mid_rules(rules, "encoder.mid_block", "mid", chs[-1])
    _norm(rules, "encoder.conv_norm_out", "norm_out")
    _conv(rules, "encoder.conv_out", "conv_out")
    _conv(rules, "quant_conv", "quant_conv")
    return rules


def vae_decoder_rules(cfg: SDConfig) -> List[Rule]:
    v = cfg.vae
    chs = v.level_channels
    rules: List[Rule] = []
    _conv(rules, "post_quant_conv", "post_quant_conv")
    _conv(rules, "decoder.conv_in", "conv_in")
    _vae_mid_rules(rules, "decoder.mid_block", "mid", chs[-1])
    c_prev = chs[-1]
    # diffusers decoder.up_blocks.{k} are already in processing order
    for k, l in enumerate(reversed(range(len(chs)))):
        c = chs[l]
        for b in range(3):
            _vae_res_rules(rules, f"decoder.up_blocks.{k}.resnets.{b}",
                           f"up/{k}/res/{b}", c_prev if b == 0 else c, c)
        c_prev = c
        if l > 0:
            _conv(rules, f"decoder.up_blocks.{k}.upsamplers.0.conv",
                  f"up/{k}/upsample")
    _norm(rules, "decoder.conv_norm_out", "norm_out")
    _conv(rules, "decoder.conv_out", "conv_out")
    return rules


# ------------------------------------------------------------------- CLIP
def _clip_tower_rules(ccfg) -> List[Rule]:
    """HF-layout (diffusers ``text_encoder``) rules for one tower config —
    SDXL's ``text_encoder_2`` ships HF-layout too, so this serves both
    ``cfg.clip`` and ``cfg.clip2`` (the LoRA resolver uses the latter)."""
    src = "text_model"
    rules: List[Rule] = [
        (f"{src}.embeddings.token_embedding.weight", "token_embedding", "direct"),
        (f"{src}.embeddings.position_embedding.weight", "position_embedding", "direct"),
    ]
    for i in range(ccfg.n_layers):
        lyr = f"{src}.encoder.layers.{i}"
        dst = f"layers/{i}"
        _norm(rules, f"{lyr}.layer_norm1", f"{dst}/ln1")
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                             ("out", "out_proj")):
            _linear(rules, f"{lyr}.self_attn.{theirs}", f"{dst}/attn/{ours}")
        _norm(rules, f"{lyr}.layer_norm2", f"{dst}/ln2")
        _linear(rules, f"{lyr}.mlp.fc1", f"{dst}/fc1")
        _linear(rules, f"{lyr}.mlp.fc2", f"{dst}/fc2")
    _norm(rules, f"{src}.final_layer_norm", "final_norm")
    if ccfg.text_projection:
        # HF CLIPTextModelWithProjection: top-level Linear (proj, d) applied
        # x @ W.T; "linear" transposes into our pooled @ W layout.
        rules.append(("text_projection.weight", "text_projection", "linear"))
    return rules


def clip_rules(cfg: SDConfig) -> List[Rule]:
    return _clip_tower_rules(cfg.clip)


_RULES = {"clip": clip_rules, "diffusion": unet_rules,
          "encoder": vae_encoder_rules, "decoder": vae_decoder_rules}

#: diffusers files carry these non-weight keys
_IGNORE = ("text_model.embeddings.position_ids",)


def _convert_one(state_dict, rule_fn, cfg, dtype, name):
    flat = {}
    consumed = set()
    for src_key, dst_path, kind in rule_fn(cfg):
        if src_key not in state_dict:
            raise KeyError(f"[{name}] missing diffusers key: {src_key}")
        flat[dst_path] = jnp.asarray(_FWD[kind](np.asarray(state_dict[src_key])),
                                     dtype)
        consumed.add(src_key)
    return _nest(flat), consumed


def convert_diffusers(unet_sd: Dict[str, np.ndarray],
                      vae_sd: Dict[str, np.ndarray],
                      text_encoder_sd: Dict[str, np.ndarray],
                      cfg: SDConfig, dtype=None,
                      text_encoder_2_sd: Dict[str, np.ndarray] = None):
    """Diffusers state dicts -> {'clip','encoder','decoder','diffusion'}.

    Exact coverage enforced on all inputs.  For SDXL configs
    (``cfg.clip2`` set) the second text tower's state dict is required and
    converts to a ``'clip2'`` entry."""
    dtype = dtype or cfg.policy.param_dtype
    out = {}
    out["diffusion"], used_u = _convert_one(unet_sd, unet_rules, cfg, dtype, "unet")
    out["encoder"], used_e = _convert_one(vae_sd, vae_encoder_rules, cfg, dtype, "vae")
    out["decoder"], used_d = _convert_one(vae_sd, vae_decoder_rules, cfg, dtype, "vae")
    out["clip"], used_c = _convert_one(text_encoder_sd, clip_rules, cfg, dtype,
                                       "text_encoder")
    checks = [(unet_sd, used_u, "unet"), (vae_sd, used_e | used_d, "vae"),
              (text_encoder_sd, used_c, "text_encoder")]
    if cfg.clip2 is not None:
        if text_encoder_2_sd is None:
            raise ValueError("SDXL config (clip2 set) requires text_encoder_2_sd")
        out["clip2"], used_c2 = _convert_one(
            text_encoder_2_sd, lambda c: _clip_tower_rules(c.clip2), cfg,
            dtype, "text_encoder_2")
        checks.append((text_encoder_2_sd, used_c2, "text_encoder_2"))
    for sd, used, name in checks:
        leftover = [k for k in sd if k not in used and k not in _IGNORE]
        if leftover:
            raise KeyError(f"[{name}] {len(leftover)} unconsumed diffusers keys "
                           f"(first 10): {sorted(leftover)[:10]}")
    return out


def deconvert_diffusers(params, cfg: SDConfig):
    """Inverse: framework pytrees -> (unet_sd, vae_sd, text_encoder_sd);
    SDXL configs return a 4-tuple with text_encoder_2_sd appended."""
    from ..core.pytree import flatten

    def inv(rule_fn, tree, sink):
        flat = flatten(tree)
        for src_key, dst_path, kind in rule_fn(cfg):
            sink[src_key] = _INV[kind](np.asarray(flat[dst_path]))

    unet_sd: Dict[str, np.ndarray] = {}
    vae_sd: Dict[str, np.ndarray] = {}
    te_sd: Dict[str, np.ndarray] = {}
    inv(unet_rules, params["diffusion"], unet_sd)
    inv(vae_encoder_rules, params["encoder"], vae_sd)
    inv(vae_decoder_rules, params["decoder"], vae_sd)
    inv(clip_rules, params["clip"], te_sd)
    if cfg.clip2 is not None:
        te2_sd: Dict[str, np.ndarray] = {}
        inv(lambda c: _clip_tower_rules(c.clip2), params["clip2"], te2_sd)
        return unet_sd, vae_sd, te_sd, te2_sd
    return unet_sd, vae_sd, te_sd


def load_diffusers_pipeline(root: str, cfg: SDConfig, dtype=None):
    """Load a diffusers directory:
    root/{unet,vae,text_encoder[,text_encoder_2]}/
    diffusion_pytorch_model.safetensors etc. (text_encoder_2 for SDXL)."""
    import os

    from .convert import load_state_dict

    def find(sub, names):
        for n in names:
            p = os.path.join(root, sub, n)
            if os.path.exists(p):
                return load_state_dict(p)
        raise FileNotFoundError(f"no weight file for {sub} under {root}")

    unet_sd = find("unet", ["diffusion_pytorch_model.safetensors",
                            "diffusion_pytorch_model.bin"])
    vae_sd = find("vae", ["diffusion_pytorch_model.safetensors",
                          "diffusion_pytorch_model.bin"])
    te_names = ["model.safetensors", "pytorch_model.bin"]
    if cfg.clip2 is None and not os.path.isdir(
            os.path.join(root, "text_encoder")):
        # SDXL-refiner dirs ship ONLY the bigG tower, as text_encoder_2/
        te_sd = find("text_encoder_2", te_names)
    else:
        te_sd = find("text_encoder", te_names)
    te2_sd = None
    if cfg.clip2 is not None:
        te2_sd = find("text_encoder_2",
                      ["model.safetensors", "pytorch_model.bin"])
    return convert_diffusers(unet_sd, vae_sd, te_sd, cfg, dtype,
                             text_encoder_2_sd=te2_sd)


# -------------------------------------------------------------- ControlNet
def controlnet_rules(cfg: SDConfig) -> List[Rule]:
    """Diffusers ``ControlNetModel`` layout (standalone controlnet dirs):
    the UNet encoder/mid key names plus ``controlnet_cond_embedding``
    (conv_in / blocks.{i} / conv_out — exactly our hint plan),
    ``controlnet_down_blocks.{i}`` (zero convs) and
    ``controlnet_mid_block``."""
    from ..models import controlnet as controlnet_mod

    u = cfg.unet
    rules: List[Rule] = []
    _linear(rules, "time_embedding.linear_1", "time_embed/fc1")
    _linear(rules, "time_embedding.linear_2", "time_embed/fc2")
    _conv(rules, "conv_in", "conv_in")

    res_i = {l: 0 for l in range(len(u.ch_mults))}
    level = 0
    for i, st in enumerate(unet_mod.encoder_plan(u)[1:]):
        dst = f"encoder/{i}"
        if st["kind"] == "down":
            _conv(rules, f"down_blocks.{level}.downsamplers.0.conv", f"{dst}/down")
            level += 1
        else:
            r = res_i[level]
            _res_rules(rules, f"down_blocks.{level}.resnets.{r}", f"{dst}/res",
                       st["c_in"], st["c_out"])
            if st["attn"]:
                _tx_rules(rules, f"down_blocks.{level}.attentions.{r}",
                          f"{dst}/attn", depth=st.get("depth", 1))
            res_i[level] += 1

    c_mid = u.level_channels[-1]
    _res_rules(rules, "mid_block.resnets.0", "bottleneck/res1", c_mid, c_mid)
    _tx_rules(rules, "mid_block.attentions.0", "bottleneck/attn",
              depth=u.depth_for(len(u.ch_mults) - 1))
    _res_rules(rules, "mid_block.resnets.1", "bottleneck/res2", c_mid, c_mid)

    plan = controlnet_mod.hint_plan(u, cfg.vae.downsample_factor)
    _conv(rules, "controlnet_cond_embedding.conv_in", "hint_block/0")
    for j in range(1, len(plan) - 1):
        _conv(rules, f"controlnet_cond_embedding.blocks.{j - 1}",
              f"hint_block/{j}")
    _conv(rules, "controlnet_cond_embedding.conv_out",
          f"hint_block/{len(plan) - 1}")

    n_skips = len(unet_mod.encoder_plan(u))
    for i in range(n_skips):
        _conv(rules, f"controlnet_down_blocks.{i}", f"zero_convs/{i}")
    _conv(rules, "controlnet_mid_block", "mid_out")

    if u.add_embed_dim:
        _linear(rules, "add_embedding.linear_1", "add_embed/fc1")
        _linear(rules, "add_embedding.linear_2", "add_embed/fc2")
    return rules


def convert_controlnet_diffusers(sd: Dict[str, np.ndarray], cfg: SDConfig,
                                 dtype=None):
    """Diffusers ControlNetModel state dict -> ControlNet pytree, exact
    coverage both ways."""
    dtype = dtype or cfg.policy.param_dtype
    tree, used = _convert_one(sd, controlnet_rules, cfg, dtype, "controlnet")
    leftover = [k for k in sd if k not in used and k not in _IGNORE]
    if leftover:
        raise KeyError(f"[controlnet] {len(leftover)} unconsumed diffusers "
                       f"keys (first 10): {sorted(leftover)[:10]}")
    return tree


def deconvert_controlnet_diffusers(params, cfg: SDConfig) -> Dict[str, np.ndarray]:
    from ..core.pytree import flatten

    flat = flatten(params)
    sd: Dict[str, np.ndarray] = {}
    for src_key, dst_path, kind in controlnet_rules(cfg):
        sd[src_key] = _INV[kind](np.asarray(flat[dst_path]))
    return sd


def load_diffusers_controlnet(root: str, cfg: SDConfig, dtype=None):
    """Load a standalone diffusers controlnet directory
    (root/diffusion_pytorch_model.safetensors)."""
    import os

    from .convert import load_state_dict

    for n in ["diffusion_pytorch_model.safetensors",
              "diffusion_pytorch_model.bin"]:
        p = os.path.join(root, n)
        if os.path.exists(p):
            return convert_controlnet_diffusers(load_state_dict(p), cfg, dtype)
    raise FileNotFoundError(f"no controlnet weight file under {root}")


# ------------------------------------------------------------- T2I-Adapter
def t2i_adapter_rules(cfg: SDConfig, num_res_blocks: int = 2,
                      xl: bool = None) -> List[Rule]:
    """Diffusers ``T2IAdapter`` (full_adapter / full_adapter_xl — picked by
    family, models/t2i_adapter.py ``adapter_layout``) <->
    models/t2i_adapter.py.

    State-dict layout (diffusers ``FullAdapter[XL]``): ``adapter.conv_in``,
    per block ``adapter.body.{i}.in_conv`` (only on channel change) and
    ``adapter.body.{i}.resnets.{j}.block1/block2``.  Rules are written
    without the ``adapter.`` prefix; the converter normalizes it away."""
    from ..models.t2i_adapter import adapter_layout

    channels, _, _ = adapter_layout(cfg.unet, cfg.vae.downsample_factor, xl)
    rules: List[Rule] = []
    _conv(rules, "conv_in", "conv_in")
    c_prev = channels[0]
    for i, c in enumerate(channels):
        if c_prev != c:
            _conv(rules, f"body.{i}.in_conv", f"body/{i}/in_conv")
        for j in range(num_res_blocks):
            _conv(rules, f"body.{i}.resnets.{j}.block1",
                  f"body/{i}/resnets/{j}/block1")
            _conv(rules, f"body.{i}.resnets.{j}.block2",
                  f"body/{i}/resnets/{j}/block2")
        c_prev = c
    return rules


def convert_t2i_adapter_diffusers(sd: Dict[str, np.ndarray], cfg: SDConfig,
                                  dtype=None, num_res_blocks: int = 2):
    """Diffusers T2IAdapter state dict -> adapter pytree, exact coverage.

    Accepts keys with or without the ``adapter.`` module prefix (standalone
    ``T2IAdapter.save_pretrained`` files carry it)."""
    if any(k.startswith("adapter.") for k in sd):
        sd = {k[len("adapter."):] if k.startswith("adapter.") else k: v
              for k, v in sd.items()}
    dtype = dtype or cfg.policy.param_dtype
    tree, used = _convert_one(
        sd, lambda c: t2i_adapter_rules(c, num_res_blocks), cfg, dtype,
        "t2i_adapter")
    leftover = [k for k in sd if k not in used]
    if leftover:
        raise KeyError(f"[t2i_adapter] {len(leftover)} unconsumed diffusers "
                       f"keys (first 10): {sorted(leftover)[:10]}")
    return tree


def deconvert_t2i_adapter_diffusers(params, cfg: SDConfig,
                                    num_res_blocks: int = 2
                                    ) -> Dict[str, np.ndarray]:
    from ..core.pytree import flatten

    flat = flatten(params)
    sd: Dict[str, np.ndarray] = {}
    for src_key, dst_path, kind in t2i_adapter_rules(cfg, num_res_blocks):
        sd[f"adapter.{src_key}"] = _INV[kind](np.asarray(flat[dst_path]))
    return sd


def load_t2i_adapter(path: str, cfg: SDConfig, dtype=None,
                     num_res_blocks: int = 2):
    """Load a diffusers T2IAdapter — a ``save_pretrained`` directory
    (``diffusion_pytorch_model.safetensors``) or a single weight file."""
    import os

    from .convert import load_state_dict

    if os.path.isdir(path):
        for n in ["diffusion_pytorch_model.safetensors",
                  "diffusion_pytorch_model.bin"]:
            p = os.path.join(path, n)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no t2i-adapter weight file under {path}")
    return convert_t2i_adapter_diffusers(load_state_dict(path), cfg, dtype,
                                         num_res_blocks)
