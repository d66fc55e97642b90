"""Checkpoint saving — the reference is load-only (SURVEY §5: "Checkpoint /
resume: load-only... no saving, no safetensors path").  This module adds the
TPU-native write path:

  * ``save_safetensors`` — export framework pytrees back to the CompVis key
    layout (via weights/convert.deconvert) as a .safetensors file, readable
    by the reference and by any other SD tool.
  * ``save_native`` / ``load_native`` — fast native round-trip of the
    framework pytrees (flat npz; no layout transposes), for caching the
    converted form so later runs skip the torch-pickle + remap cost.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pytree import flatten, unflatten_like
from ..models.config import SDConfig
from . import convert as convert_mod


def save_safetensors(params: Dict[str, dict], cfg: SDConfig, path: str) -> None:
    """Export {clip, encoder, decoder, diffusion} pytrees to a CompVis-layout
    .safetensors file (inverse of load; reference-compatible key namespace)."""
    from safetensors.numpy import save_file

    sd = convert_mod.deconvert(params, cfg)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, path)


def save_native(params, path: str) -> None:
    """Framework-layout checkpoint: one .npz of flattened leaves."""
    flat = {k: np.asarray(v) for k, v in flatten(params).items()}
    np.savez(path, **flat)


def load_native(template, path: str, dtype=None):
    """Load a save_native checkpoint into the structure of ``template``
    (strict coverage — missing/extra keys raise)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    if dtype is not None:
        flat = {k: jnp.asarray(v, dtype) for k, v in flat.items()}
    else:
        flat = {k: jnp.asarray(v) for k, v in flat.items()}
    return unflatten_like(template, flat)
