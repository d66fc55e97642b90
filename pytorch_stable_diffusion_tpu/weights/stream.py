"""Streamed checkpoint loading: tensor-by-tensor host -> HBM placement.

``load_sd_checkpoint`` (convert.py) materializes the full source state dict
on host before converting — at SD-1.5 scale ~3.4 GB resident, twice that
transiently, then one bulk host->device copy.  The reference does the same
through ``torch.load`` (``/root/reference/sd/model_converter.py:5``).

This module walks the same converter rules ONE TENSOR AT A TIME:

    mmap-backed read -> layout transform -> dtype cast -> jax.device_put
    with the leaf's target sharding -> host copy released

Peak host memory is a single transformed tensor; each leaf lands directly in
its final (possibly sharded) HBM layout — the serving-oriented load path for
multi-chip meshes:

  * ``mesh=`` given            -> every leaf replicated over the mesh
                                  (the DP serving layout, parallel/dp.py)
  * ``mesh=`` + ``tp=True``    -> attention/FFN matmuls land pre-sharded with
                                  the Megatron PartitionSpecs
                                  (parallel/tp.py ``tp_spec``) — no
                                  replicate-then-reshard step, so a model
                                  larger than one chip's HBM can be loaded
  * no mesh                    -> default-device placement (single chip)

Source formats: ``.safetensors`` streams natively (the C++ mmap reader's
zero-copy views, else the safetensors package's lazy ``safe_open``);
``.ckpt`` has no random-access container, so it is read eagerly first (the
placement is still per-tensor — documented degradation).
"""

from __future__ import annotations

from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import SDConfig
from . import convert as convert_mod


class _SafeOpenMapping(Mapping):
    """Lazy Mapping over a safetensors file via the package's safe_open."""

    def __init__(self, path: str):
        from safetensors import safe_open

        self._f = safe_open(path, framework="np")
        self._keys = list(self._f.keys())

    def __getitem__(self, k):
        return self._f.get_tensor(k)

    def __iter__(self):
        return iter(self._keys)

    def __len__(self):
        return len(self._keys)


def _lazy_state_dict(path: str, allow_unsafe_fallback: bool) -> Mapping:
    p = str(path)
    if p.endswith(".safetensors"):
        from . import native_io

        if native_io.available():
            # zero-copy views into the file mapping: pages are faulted in as
            # each tensor is transformed and are evictable afterwards
            return native_io.load_safetensors(p, copy=False)
        return _SafeOpenMapping(p)
    # .ckpt: zip-of-pickle has no per-tensor random access — eager read
    return convert_mod.load_state_dict(
        p, allow_unsafe_fallback=allow_unsafe_fallback)


def load_sd_checkpoint_streamed(
    path: str,
    cfg: SDConfig,
    dtype=None,
    *,
    mesh: Optional[Mesh] = None,
    tp: bool = False,
    allow_unsafe_fallback: bool = False,
):
    """File path -> {clip, encoder, decoder, diffusion} pytrees, streamed.

    Returns the same tree as ``convert.load_sd_checkpoint`` (same coverage
    guarantees — both directions enforced by convert()), but every leaf is a
    committed jax.Array placed per the mesh/tp arguments as it is read.
    """
    dtype = dtype or cfg.policy.param_dtype
    src = _lazy_state_dict(path, allow_unsafe_fallback)

    if mesh is None:
        def place(name, dst_path, x):
            return jax.device_put(np.ascontiguousarray(x).astype(dtype))
    else:
        if tp:
            from ..parallel.tp import tp_spec as spec_fn
        else:
            spec_fn = lambda name, dst_path: P()

        def place(name, dst_path, x):
            return jax.device_put(
                np.ascontiguousarray(x).astype(dtype),
                NamedSharding(mesh, spec_fn(name, dst_path)))

    return convert_mod.convert(src, cfg, dtype, place=place)
