"""Sequence (spatial) parallelism — the batch-1 LATENCY lever.

Data parallelism (dp.py) scales throughput only: a single image's denoise
loop still runs on one chip.  This mode shards the *spatial* dimension of
the UNet compute over the mesh's ``model`` axis instead, so all chips
cooperate on one image:

  * the pipeline constrains the UNet input sharding to
    ``P(None, 'model', None, None)`` (latent-H split) each step
    (``pipeline._compiled_txt2img(sp_mesh=...)``);
  * XLA GSPMD propagates it through convs (halo exchanges —
    collective-permutes of 1-row edges), GroupNorm reductions (psum), and
    all projections (token-sharded rows, replicated weights);
  * SELF-ATTENTION runs inside a ``shard_map``
    (``ops/attention._sp_self_attention``): each shard all-gathers K/V
    over ICI and runs the regular per-shard kernel — including the Pallas
    flash kernel, which is a custom call GSPMD itself cannot partition —
    on its local q rows.  The standard sequence-parallel decomposition,
    with the production kernel intact;
  * params stay replicated (dp.replicate_params) — no Megatron resharding,
    so the fused-qkv matmul form is kept (cf. ADVICE r2 on TP).

The reference has no analog (single device, SURVEY §2.3); BASELINE's
multi-chip config is DP.  This is the elective latency tier flagged in
VERDICT r2 #6.  Hardware scaling numbers are out of scope on the 1-chip
host; correctness — for both attention backends — is proven against the
single-device pipeline on the virtual CPU mesh (tests/test_sp.py) and the
driver dryrun exercises the compile+execute path.
"""

from __future__ import annotations

from jax.sharding import Mesh

from .dp import replicate_params


def generate_spatial(prompt, uncond_prompt="", *, mesh: Mesh, models=None,
                     **kwargs):
    """Single-image (or small-batch) generation with the denoise loop
    spatially sharded over ``mesh``'s model axis.  Same keyword surface as
    ``pipeline.generate``."""
    from .. import pipeline as pipeline_mod

    models = replicate_params(models, mesh)
    return pipeline_mod.generate(prompt, uncond_prompt, models=models,
                                 mesh=mesh, sequence_parallel=True, **kwargs)
