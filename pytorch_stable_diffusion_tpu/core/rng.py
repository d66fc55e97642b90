"""PRNG-key discipline.

The reference threads one stateful ``torch.Generator`` through latent init,
VAE-encoder noise, and every per-step sampler draw in call order
(``/root/reference/sd/pipeline.py:92-98,177,196``; ``sd/ddpm.py:131,184``).
JAX PRNG is counter-based, so we replace the implicit call-order contract
with an explicit *named stream* scheme: one root key, folded with a stable
role tag (and, for per-step noise, the timestep index).  Results are
therefore independent of evaluation order, batching, and shard count.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp

# Stable role → fold constant.  Hash the name so adding streams never
# renumbers existing ones (which would silently change all outputs).
_STREAMS = {}


def _tag(name: str) -> int:
    t = _STREAMS.get(name)
    if t is None:
        t = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
        _STREAMS[name] = t
    return t


def stream(key: jax.Array, name: str) -> jax.Array:
    """Derive the named substream key (e.g. 'latent_init', 'encoder_noise')."""
    return jax.random.fold_in(key, _tag(name))


def step_key(key: jax.Array, name: str, step) -> jax.Array:
    """Key for per-timestep noise: fold stream tag then the step index.

    ``step`` may be a traced int32 — usable inside ``lax.scan``.
    """
    return jax.random.fold_in(stream(key, name), step)


def batch_keys(key: jax.Array, name: str, n: int) -> jax.Array:
    """Per-sample keys so batched generation is element-wise reproducible:
    sample i gets the same noise regardless of batch size or shard layout.
    """
    base = stream(key, name)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(jnp.arange(n))


def normal_like(key: jax.Array, x: jax.Array, dtype=None) -> jax.Array:
    return jax.random.normal(key, x.shape, dtype or x.dtype)
