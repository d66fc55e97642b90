"""Parameter-pytree utilities.

Our models are pure ``init(key, cfg) -> params`` / ``apply(params, ...)``
function pairs over nested-dict pytrees.  These helpers give the converter
and tests a flat ``a/b/c -> array`` view with exact-coverage checking — the
analog of the reference's ``load_state_dict(strict=True)``
(``/root/reference/sd/model_loader.py:30``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten(tree, sep: str = "/") -> Dict[str, jax.Array]:
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(f"{prefix}{sep}{i}" if prefix else str(i), v)
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten_like(template, flat: Dict[str, jax.Array], sep: str = "/"):
    """Rebuild a pytree with the template's structure from a flat dict.

    Raises on any missing or extra key — strict coverage.
    """
    tpl_flat = flatten(template, sep)
    missing = sorted(set(tpl_flat) - set(flat))
    extra = sorted(set(flat) - set(tpl_flat))
    if missing or extra:
        raise KeyError(
            f"strict unflatten failed: {len(missing)} missing, {len(extra)} extra.\n"
            f"missing (first 10): {missing[:10]}\nextra (first 10): {extra[:10]}"
        )
    for k, tpl_v in tpl_flat.items():
        v = flat[k]
        if tuple(tpl_v.shape) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch at {k}: expected {tpl_v.shape}, got {np.shape(v)}")

    def rec(prefix, node):
        if isinstance(node, dict):
            return {k: rec(f"{prefix}{sep}{k}" if prefix else str(k), v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [rec(f"{prefix}{sep}{i}" if prefix else str(i), v) for i, v in enumerate(node)]
            return type(node)(seq) if isinstance(node, tuple) else seq
        return flat[prefix]

    return rec("", template)


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def tree_psnr(a, b) -> float:
    """Peak-SNR (dB) between two pytrees/arrays — the BASELINE.json metric."""
    a_flat = jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(a)])
    b_flat = jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(b)])
    mse = jnp.mean((a_flat - b_flat) ** 2)
    peak = jnp.maximum(jnp.max(jnp.abs(a_flat)), 1e-12)
    return float(10.0 * jnp.log10(peak**2 / jnp.maximum(mse, 1e-30)))
