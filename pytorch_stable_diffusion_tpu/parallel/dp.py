"""Data-parallel generation over an ICI device mesh.

The reference is strictly single-device (SURVEY §2.3); this module is the
TPU-native extension required by BASELINE.json config 5 ("shard_map
data-parallel txt2img across a v5e-8 slice").

Design: the whole jitted pipeline (pipeline._compiled_txt2img) is a pure
SPMD program.  We replicate params over the mesh and shard every batch
input over the ``data`` axis with NamedSharding; XLA's partitioner then runs
the UNet/VAE/CLIP on per-shard batches with zero collectives in the hot loop
(generation is embarrassingly data-parallel — the only cross-device traffic
is the replicated-weight broadcast at load time).

Per-sample PRNG folding (core/rng.py) makes shard-count invisible: sample i
gets identical noise whether generated on 1 chip or 8.
"""

from __future__ import annotations

import jax

from .. import pipeline as pipeline_mod
from ..core.mesh import make_mesh, replicated


def replicate_params(models, mesh):
    """Place every weight on all mesh devices (HBM-resident, no offload)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), models)


def generate_images_dp(prompts, uncond_prompts="", *, mesh=None, models=None,
                       **kwargs):
    """Batched txt2img/img2img sharded over the mesh's data axis.

    ``len(prompts)`` must be divisible by the data-axis size.  Returns all
    images (B, H, W, 3) uint8.  Results are bit-identical to the
    single-device path for the same seed (per-sample PRNG folding).
    """
    mesh = mesh or make_mesh()
    n_data = mesh.shape["data"]
    if len(prompts) % n_data:
        raise ValueError(f"batch {len(prompts)} not divisible by data axis {n_data}")
    models = replicate_params(models, mesh)
    images, _ = pipeline_mod._run_generate(
        list(prompts), uncond_prompts, models=models, mesh=mesh, **kwargs)
    return images
