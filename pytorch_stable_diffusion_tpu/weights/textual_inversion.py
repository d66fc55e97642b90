"""Textual-inversion embeddings (community ``.pt`` / ``.safetensors``).

The reference has no embedding support; this implements the de-facto
ecosystem formats:

  * A1111 ``.pt``: ``{"string_to_param": {"*": (n, d)}, "name": str}`` —
    read through the restricted torch unpickler (no pickle execution,
    ``ckpt_reader.load_torch_object``);
  * A1111 ``.safetensors``: ``{"emb_params": (n, d)}``;
  * diffusers ``.safetensors``/``.pt``: ``{"<token>": (n, d)}``;
  * SDXL dual-tower ``.safetensors``: ``{"clip_l": (n, 768), "clip_g":
    (n, 1280)}`` — one trigger feeding both text towers.

An embedding adds ``n`` new rows to the CLIP token-embedding table and
registers a trigger word with the tokenizer that expands to those ids
(``tokenizer.add_placeholder``) — pure weight/vocab transforms, nothing in
the compiled pipeline changes shape except the embedding table, so there is
no recompile beyond the first use.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.config import SDConfig


def load_embedding(path: str, token: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Embedding file -> {trigger_token: (n, d) float array}.

    ``token`` overrides the trigger word (default: the file's embedded name
    or the file stem, A1111 convention)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    if path.endswith(".safetensors"):
        from . import native_io

        if native_io.available():
            sd = native_io.load_safetensors(path)
        else:
            from safetensors import safe_open

            sd = {}
            with safe_open(path, framework="np") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        if set(sd) >= {"clip_l", "clip_g"}:
            # SDXL dual-tower layout: one trigger, a row-aligned pair of
            # tables (CLIP-L 768-d + bigG 1280-d) keyed per tower
            pair = {k: np.atleast_2d(np.asarray(sd[k], np.float32))
                    for k in ("clip_l", "clip_g")}
            if pair["clip_l"].shape[0] != pair["clip_g"].shape[0]:
                raise ValueError(
                    "dual-tower embedding has mismatched vector counts: "
                    f"clip_l {pair['clip_l'].shape[0]} vs clip_g "
                    f"{pair['clip_g'].shape[0]}")
            return {token or stem: pair}
        if "emb_params" in sd:  # A1111 layout
            return {token or stem: np.asarray(sd["emb_params"], np.float32)}
        if len(sd) == 1:  # diffusers layout: the key IS the trigger
            (k, v), = sd.items()
            return {token or k: np.asarray(v, np.float32)}
        raise ValueError(f"unrecognized embedding keys {sorted(sd)[:5]}")

    from .ckpt_reader import load_torch_object

    obj = load_torch_object(path)
    if not isinstance(obj, dict):
        raise ValueError(f"embedding root is {type(obj)}, expected dict")
    if "string_to_param" in obj:  # A1111 .pt
        params = obj["string_to_param"]
        (v,) = [np.asarray(x, np.float32) for x in params.values()]
        name = obj.get("name") if isinstance(obj.get("name"), str) else None
        return {token or name or stem: v}
    arrays = {k: v for k, v in obj.items() if isinstance(v, np.ndarray)}
    if len(arrays) == 1:  # diffusers .pt
        (k, v), = arrays.items()
        return {token or k: np.asarray(v, np.float32)}
    raise ValueError(f"unrecognized embedding file layout: {sorted(obj)[:5]}")


def add_embeddings(models: dict, tokenizer, cfg: SDConfig,
                   embeddings: Dict[str, np.ndarray],
                   ) -> Tuple[dict, object, SDConfig]:
    """Extend the CLIP embedding table and tokenizer with trigger words.

    Returns (models, tokenizer, cfg) — all fresh objects; the originals are
    untouched.  cfg.clip.vocab_size grows so the pipeline's token-bound
    validation accepts the new ids.

    Dual-tower models (SDXL: ``cfg.clip2``) encode the SAME token ids
    through both towers, so each embedding must be the dual-tower form
    ``{"clip_l": (n, d1), "clip_g": (n, d2)}`` and both tables grow in
    lockstep.  Single-tower models take plain ``(n, d)`` arrays."""
    emb = np.asarray(models["clip"]["token_embedding"])
    d = emb.shape[1]
    dual = cfg.clip2 is not None
    if dual:
        emb2 = np.asarray(models["clip2"]["token_embedding"])
        if emb2.shape[0] != emb.shape[0]:
            raise ValueError(
                f"tower vocab mismatch: clip {emb.shape[0]} vs clip2 "
                f"{emb2.shape[0]} — cannot share new token ids")
        d2 = emb2.shape[1]
        rows2 = [emb2]
    tok = tokenizer.clone()
    rows = [emb]
    next_id = emb.shape[0]
    for trigger, arr in embeddings.items():
        if isinstance(arr, dict):  # dual-tower {"clip_l": ..., "clip_g": ...}
            if not dual:
                raise ValueError(
                    f"embedding '{trigger}' is dual-tower (SDXL) but the "
                    "model has a single text tower")
            a1 = np.atleast_2d(np.asarray(arr["clip_l"], emb.dtype))
            a2 = np.atleast_2d(np.asarray(arr["clip_g"], emb2.dtype))
            if a1.shape[0] != a2.shape[0]:
                raise ValueError(f"embedding '{trigger}': clip_l has "
                                 f"{a1.shape[0]} vectors, clip_g {a2.shape[0]}")
            if a1.shape[1] != d or a2.shape[1] != d2:
                raise ValueError(
                    f"embedding '{trigger}' dims ({a1.shape[1]}, "
                    f"{a2.shape[1]}) != model ({d}, {d2})")
            n = a1.shape[0]
            rows.append(a1)
            rows2.append(a2)
        else:
            if dual:
                raise ValueError(
                    f"embedding '{trigger}' is single-tower but the model "
                    "is dual-tower (SDXL) — need {'clip_l': ..., 'clip_g': "
                    "...} vectors for both towers")
            arr = np.atleast_2d(np.asarray(arr, emb.dtype))
            if arr.shape[1] != d:
                raise ValueError(f"embedding '{trigger}' has dim "
                                 f"{arr.shape[1]}, model expects {d}")
            n = arr.shape[0]
            rows.append(arr)
        tok.add_placeholder(trigger, list(range(next_id, next_id + n)))
        next_id += n
    new_clip = dict(models["clip"])
    new_clip["token_embedding"] = jnp.asarray(np.concatenate(rows, axis=0))
    new_models = dict(models, clip=new_clip)
    new_cfg_clip = dataclasses.replace(cfg.clip, vocab_size=next_id)
    if dual:
        new_clip2 = dict(models["clip2"])
        new_clip2["token_embedding"] = jnp.asarray(
            np.concatenate(rows2, axis=0))
        new_models["clip2"] = new_clip2
        new_cfg = dataclasses.replace(
            cfg, clip=new_cfg_clip,
            clip2=dataclasses.replace(cfg.clip2, vocab_size=next_id))
    else:
        new_cfg = dataclasses.replace(cfg, clip=new_cfg_clip)
    return new_models, tok, new_cfg
