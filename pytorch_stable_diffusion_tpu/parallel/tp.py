"""Tensor parallelism over the mesh's ``model`` axis.

The reference is single-device (SURVEY §2.3); BASELINE's required multi-chip
mode is data parallelism (dp.py).  This module adds the elective TP tier:
Megatron-style sharding of the transformer matmuls, expressed purely as
parameter PartitionSpecs — XLA's SPMD partitioner then splits the matmuls
and inserts the psum/all-gather collectives (no hand-written comms, ICI by
construction).

Pattern per attention/FFN pair (column-then-row):
  * q/k/v and GeGLU up-projection kernels (in, out): shard OUT -> heads and
    hidden units split across chips, no comm on entry;
  * out-projection / GeGLU down-projection kernels (in, out): shard IN ->
    each chip contracts its local slice, XLA inserts one psum per pair.
Convs, norms, embeddings, and the VAE stay replicated (conv channel counts
at the small SD sizes don't amortize collective latency).

Head-count constraint: n_heads must be divisible by the model-axis size for
the head-split to be balanced (8 heads -> model in {1,2,4,8}).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import MODEL_AXIS

COL = P(None, MODEL_AXIS)   # shard kernel out-dim
ROW = P(MODEL_AXIS, None)   # shard kernel in-dim
BIAS_COL = P(MODEL_AXIS)    # bias of a column-parallel linear
REPL = P()


#: spec per attention leaf ("q/kernel" etc.): column-parallel projections,
#: row-parallel out; row-parallel bias stays replicated (added after the psum)
_ATTN_LEAF = {
    "q/kernel": COL, "k/kernel": COL, "v/kernel": COL,
    "q/bias": BIAS_COL, "k/bias": BIAS_COL, "v/bias": BIAS_COL,
    "out/kernel": ROW, "out/bias": REPL,
}


def _attention_rules(prefix: str) -> Dict[str, P]:
    return {f"{prefix}/{leaf}": spec for leaf, spec in _ATTN_LEAF.items()}


def tp_spec(model_name: str, path: str) -> P:
    """PartitionSpec for ONE flat param path — usable without materializing
    the pytree (the streamed loader, weights/stream.py, places each tensor
    as it is read).  The pytree-level ``*_tp_rules`` wrap this."""
    if model_name == "diffusion":
        if "/self_attn/" in path or "/cross_attn/" in path:
            return _ATTN_LEAF.get("/".join(path.rsplit("/", 2)[-2:]), REPL)
        if path.endswith("geglu_proj/kernel"):
            return COL
        if path.endswith("geglu_proj/bias"):
            return BIAS_COL
        if path.endswith("geglu_out/kernel"):
            return ROW
    elif model_name in ("clip", "clip2"):
        if "/attn/" in path:
            return _ATTN_LEAF.get("/".join(path.rsplit("/", 2)[-2:]), REPL)
        if path.endswith("fc1/kernel"):
            return COL
        if path.endswith("fc1/bias"):
            return BIAS_COL
        if path.endswith("fc2/kernel"):
            return ROW
    return REPL


def unet_tp_rules(params) -> Dict[str, P]:
    """PartitionSpec per flat param path for the UNet pytree."""
    from ..core.pytree import flatten

    return {p: tp_spec("diffusion", p) for p in flatten(params)
            if tp_spec("diffusion", p) != REPL
            or p.endswith(("self_attn/out/bias", "cross_attn/out/bias"))}


def clip_tp_rules(params, model_name: str = "clip") -> Dict[str, P]:
    from ..core.pytree import flatten

    return {p: tp_spec(model_name, p) for p in flatten(params)
            if tp_spec(model_name, p) != REPL or p.endswith("attn/out/bias")}


def shard_models(models, mesh: Mesh):
    """Place {clip, encoder, decoder, diffusion} on the mesh with TP specs.

    Unruled params are replicated.  With model-axis size 1 this degrades to
    plain replication (the dp.py layout).
    """
    from ..core.pytree import flatten, unflatten_like

    all_rules = {
        "clip": clip_tp_rules(models["clip"]),
        "diffusion": unet_tp_rules(models["diffusion"]),
        "encoder": {},
        "decoder": {},
    }
    if "clip2" in models:  # SDXL second text tower
        all_rules["clip2"] = clip_tp_rules(models["clip2"], "clip2")
    out = {}
    for name, params in models.items():
        rules = all_rules.get(name, {})
        flat = flatten(params)
        placed = {}
        for path, leaf in flat.items():
            spec = rules.get(path, REPL)
            placed[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
        out[name] = unflatten_like(params, placed)
    return out


def generate_images_tp(prompts, uncond_prompts="", *, mesh: Mesh, models=None,
                       **kwargs):
    """Batched generation with TP (+DP if the data axis > 1) shardings.

    The compiled pipeline is unchanged — XLA partitions it from the input
    and parameter shardings alone.
    """
    from .. import pipeline as pipeline_mod

    n_data = mesh.shape["data"]
    if len(prompts) % n_data:
        raise ValueError(f"batch {len(prompts)} not divisible by data axis {n_data}")
    models = shard_models(models, mesh)
    images, _ = pipeline_mod._run_generate(
        list(prompts), uncond_prompts, models=models, mesh=mesh, **kwargs)
    return images
