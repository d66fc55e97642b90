"""Checkpoint merging (the A1111 "Checkpoint Merger" tab semantics).

No reference analog; pure pytree transforms over already-converted model
bundles, so merges compose with every loader/format and the jitted
pipeline recompiles nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _blend2(alpha):
    def f(x, y):
        out = (1.0 - alpha) * x.astype(jnp.float32) \
            + alpha * y.astype(jnp.float32)
        return out.astype(x.dtype)
    return f


def _blend3(alpha):
    def f(x, y, z):
        out = x.astype(jnp.float32) \
            + alpha * (y.astype(jnp.float32) - z.astype(jnp.float32))
        return out.astype(x.dtype)
    return f


def merge_models(a, b, alpha: float = 0.5, c=None):
    """Weighted-sum merge ``(1-alpha)·A + alpha·B``, or — with ``c`` —
    add-difference ``A + alpha·(B − C)`` (A1111's two merge modes).

    ``a``/``b``/``c`` are model pytrees of identical structure (a single
    model's params or the whole ``{"clip", "encoder", ...}`` bundle).
    Arithmetic runs in fp32 and casts back to A's leaf dtypes."""
    if c is None:
        return jax.tree_util.tree_map(_blend2(float(alpha)), a, b)
    return jax.tree_util.tree_map(_blend3(float(alpha)), a, b, c)
