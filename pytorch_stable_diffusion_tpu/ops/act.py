"""Activations.

* silu — used throughout VAE/UNet (reference ``nn.SiLU()``).
* quick_gelu — CLIP's intentional x*sigmoid(1.702x)
  (``/root/reference/sd/clip.py:166``); distinct from GELU, do not "fix".
* geglu — the UNet FFN gate.  The reference has a genuine bug here: it
  computes ``x, gate = proj(x).chunk(2)`` then projects ``x`` WITHOUT the
  ``x * gelu(gate)`` product (``/root/reference/sd/diffusion.py:359-363``).
  Default is the correct CompVis GeGLU (the SD-1.5 weights were trained with
  it); ``reference_quirks=True`` reproduces the bug for golden-parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x):
    return x * jax.nn.sigmoid(x)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def geglu(h, reference_quirks: bool = False):
    """h: output of the (C -> 8C) projection; returns 4C features."""
    x, gate = jnp.split(h, 2, axis=-1)
    if reference_quirks:
        return x  # reference drops the gate (sd/diffusion.py:359-363)
    return x * jax.nn.gelu(gate, approximate=False)
