"""LoRA adapter loading and merging (capability beyond the reference).

The reference (`/root/reference/sd/model_loader.py`) loads only full
checkpoints; community SD deployments overwhelmingly compose a base model
with low-rank adapters.  This merges adapters into our parameter pytrees
*offline* (weights stay a plain pytree; the jitted pipeline is untouched —
on TPU a pre-merged weight is strictly better than a per-step
``W x + up(down(x))`` detour, which would add two thin matmuls per layer
that can't use the MXU efficiently at rank 4-128).

Supported formats (auto-detected per key):

* **kohya / sd-scripts** (the common single-file ``.safetensors`` LoRA):
  ``lora_unet_{module}.lora_down.weight`` / ``.lora_up.weight`` /
  ``.alpha`` where ``{module}`` is the diffusers module path with dots
  flattened to underscores (``down_blocks_0_attentions_0_...``), plus
  ``lora_te_`` / ``lora_te1_`` (CLIP-L tower) and ``lora_te2_`` (SDXL
  bigG tower, HF layout) for the text encoders.
* **diffusers / PEFT**: dotted module paths with ``.lora_A.weight`` (down)
  / ``.lora_B.weight`` (up) under ``unet.`` / ``text_encoder.`` /
  ``text_encoder_2.`` roots.  PEFT stores no per-module alpha in the
  state dict; alpha defaults to the rank (scaling 1), the PEFT default.

Merge rule per target weight ``W`` (checkpoint layout, fp32):

    W' = W + scale * (alpha / rank) * up @ down

computed in the torch-native ``(out, in[, kh, kw])`` layout and then pushed
through the SAME layout transform the converter applies for that leaf
(transpose for linears, OIHW->HWIO for convs) — so a merged-then-converted
checkpoint and a converted-then-merged pytree agree exactly (tested both
ways in tests/test_lora.py).  Conv LoRAs (LoCon-style 3x3 down + 1x1 up)
are supported; Hadamard/Kronecker factorizations (LoHa/LoKr) are not and
raise under ``strict=True``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.pytree import flatten
from ..models.config import SDConfig
from .convert import _fwd_transform, _nest
from . import diffusers as dif


def _weight_targets(cfg: SDConfig) -> Dict[str, List[Tuple[str, str, str]]]:
    """Dotted diffusers module path (no ``.weight``) ->
    list of (model_name, dst_path, kind) for every kernel leaf.

    A list because SDXL maps BOTH text towers; everything else is 1:1."""
    towers = [("unet.", "diffusion", dif.unet_rules(cfg)),
              ("text_encoder.", "clip", dif._clip_tower_rules(cfg.clip))]
    if cfg.clip2 is not None:
        towers.append(("text_encoder_2.", "clip2",
                       dif._clip_tower_rules(cfg.clip2)))
    out: Dict[str, List[Tuple[str, str, str]]] = {}
    for root, model, rules in towers:
        for src, dst, kind in rules:
            if not src.endswith(".weight") or not isinstance(kind, str):
                continue
            if kind not in ("conv", "linear", "conv1x1_linear"):
                continue  # norms/embeddings are not LoRA targets
            out.setdefault(root + src[:-len(".weight")], []).append(
                (model, dst, kind))
    return out


#: kohya prefix -> dotted root it stands for
_KOHYA_ROOTS = (("lora_unet_", "unet."),
                ("lora_te1_", "text_encoder."),
                ("lora_te2_", "text_encoder_2."),
                ("lora_te_", "text_encoder."))


def _group_lora_keys(lora_sd) -> Dict[str, dict]:
    """Raw LoRA state dict -> {module_name: {down, up, alpha}} with
    module_name kept in the file's own spelling (underscored or dotted)."""
    groups: Dict[str, dict] = {}
    for key, val in lora_sd.items():
        for suffix, slot in ((".lora_down.weight", "down"),
                             (".lora_up.weight", "up"),
                             (".lora_A.weight", "down"),
                             (".lora_B.weight", "up"),
                             (".alpha", "alpha")):
            if key.endswith(suffix):
                name = key[:-len(suffix)]
                # PEFT nests an adapter name: "...to_q.lora_A.default.weight"
                if slot != "alpha" and name.endswith(".default"):
                    name = name[:-len(".default")]
                groups.setdefault(name, {})[slot] = np.asarray(val)
                break
        else:
            raise ValueError(f"unrecognized LoRA key: {key!r} (LoHa/LoKr "
                             "factorizations are not supported)")
    return groups


def _resolve(name: str, targets: Dict[str, List[Tuple[str, str, str]]],
             und_index: Dict[str, str]):
    """LoRA module name (kohya-underscored or PEFT-dotted) -> dotted key."""
    if name in targets:
        return name
    for prefix, root in _KOHYA_ROOTS:
        if name.startswith(prefix):
            return und_index.get((root, name[len(prefix):]))
    return None


def apply_lora(params, cfg: SDConfig, lora_sd, scale: float = 1.0, *,
               strict: bool = True):
    """Merge one LoRA state dict into ``params`` (functional — returns a new
    pytree; untouched leaves are shared).  ``scale`` is the user strength
    multiplier (on top of the adapter's own alpha/rank scaling)."""
    targets = _weight_targets(cfg)
    und_index = {}
    for k in targets:
        root, rest = k.split(".", 1)
        und_index[(root + ".", rest.replace(".", "_"))] = k
    groups = _group_lora_keys(lora_sd)

    flats = {m: dict(flatten(p)) for m, p in params.items()}
    unmatched, matched = [], 0
    for name, g in sorted(groups.items()):
        dotted = _resolve(name, targets, und_index)
        if dotted is None:
            unmatched.append(name)
            continue
        if "down" not in g or "up" not in g:
            raise ValueError(f"LoRA module {name!r} is missing its "
                             f"{'up' if 'down' in g else 'down'} factor")
        down, up = g["down"].astype(np.float32), g["up"].astype(np.float32)
        rank = down.shape[0]
        if up.shape[1] != rank:
            raise ValueError(f"LoRA module {name!r}: up factor rank "
                             f"{up.shape[1]} != down rank {rank}")
        alpha = float(g["alpha"]) if "alpha" in g else float(rank)
        # (out, r[,1,1]) @ (r, in[,k,k]) in torch layout
        delta = (up.reshape(up.shape[0], rank)
                 @ down.reshape(rank, -1)).reshape(
                     (up.shape[0],) + down.shape[1:])
        for model, dst, kind in targets[dotted]:
            dl = delta
            if kind == "conv" and dl.ndim == 2:
                # linear-factored LoRA on a 1x1 conv target
                dl = dl[:, :, None, None]
            leaf = flats[model][dst]
            d = _fwd_transform(kind, dl) * (scale * alpha / rank)
            if d.shape != leaf.shape:
                raise ValueError(
                    f"LoRA module {name!r}: delta shape {d.shape} does not "
                    f"match target {model}/{dst} {leaf.shape}")
            flats[model][dst] = (leaf.astype(jnp.float32) + d).astype(leaf.dtype)
            matched += 1
    if unmatched and strict:
        raise KeyError(f"{len(unmatched)} LoRA modules have no target in "
                       f"this architecture (first 10): {unmatched[:10]}")
    if matched == 0:
        raise ValueError("LoRA matched zero modules — wrong file or "
                         "architecture?")
    return {m: _nest(f) for m, f in flats.items()}


def apply_loras(params, cfg: SDConfig,
                loras: List[Tuple[dict, float]], **kw):
    """Merge several (state_dict, scale) adapters in order (merges are
    additive in fp32, so order only matters for rounding)."""
    for sd, scale in loras:
        params = apply_lora(params, cfg, sd, scale, **kw)
    return params


def load_lora(path: str):
    """Read a LoRA adapter file (.safetensors via the native reader when
    available, or a torch-pickle .pt/.ckpt through the restricted
    unpickler)."""
    from .convert import load_state_dict

    return load_state_dict(str(path))
