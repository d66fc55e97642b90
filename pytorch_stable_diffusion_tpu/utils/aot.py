"""AOT export of the compiled generation program (deployment path).

Serving deployments should not pay the 8-15 min cold compile (CLAUDE.md) at
process start.  ``export_pipeline`` lowers the full generation program via
``jax.export`` into a portable StableHLO artifact tied to the lowering
platform; ``load_pipeline`` restores a callable without retracing any model
code (weights are passed at call time, so one artifact serves any SD-1.5
checkpoint).

Note: the artifact embeds platform + shapes (batch, size, steps, sampler);
export one per serving configuration.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import SDConfig
from ..pipeline import _compiled_txt2img


def export_pipeline(cfg: SDConfig, models, *, n_steps: int = 50, batch: int = 1,
                    height: int = 512, width: int = 512, do_cfg: bool = True,
                    sampler: str = "ddpm") -> bytes:
    """Serialize the full txt2img program for the given static configuration.

    ``models`` supplies only shapes/dtypes for the export signature; the
    returned artifact takes weights as a runtime argument.
    """
    f = cfg.vae.downsample_factor
    if height % f or width % f:
        raise ValueError(f"height/width must be multiples of {f}")
    h_lat, w_lat = height // f, width // f
    run = _compiled_txt2img(cfg, n_steps, do_cfg, batch, h_lat, w_lat,
                            False, False, False, sampler, 0.0)

    args = (
        models,
        jnp.zeros((batch, cfg.clip.max_len), jnp.int32),
        jnp.zeros((batch, cfg.clip.max_len), jnp.int32),
        jax.random.PRNGKey(0),
        jnp.float32(7.5),
        jnp.int32(0),
        jnp.zeros((batch, height, width, 3), jnp.float32),
        {"latent_init": jnp.zeros((1,), jnp.float32)},
    )
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)
    exported = jax.export.export(run)(*shapes)
    return bytes(exported.serialize())


class LoadedPipeline:
    """Deserialized AOT artifact; call like the compiled run function."""

    def __init__(self, blob: bytes):
        self._exported = jax.export.deserialize(blob)
        self.platforms = self._exported.platforms

    def __call__(self, models, cond_tokens, uncond_tokens, key, cfg_scale,
                 start_step=0):
        b, L = np.shape(cond_tokens)
        # image/noises placeholders matching the exported txt2img signature
        in_avals = self._exported.in_avals
        image_shape = in_avals[-2].shape
        out = self._exported.call(
            models, jnp.asarray(cond_tokens, jnp.int32),
            jnp.asarray(uncond_tokens, jnp.int32), key,
            jnp.float32(cfg_scale), jnp.int32(start_step),
            jnp.zeros(image_shape, jnp.float32),
            {"latent_init": jnp.zeros((1,), jnp.float32)})
        images, latents = out
        return np.asarray(images).astype(np.uint8), np.asarray(latents)


def load_pipeline(blob: bytes) -> LoadedPipeline:
    return LoadedPipeline(blob)
