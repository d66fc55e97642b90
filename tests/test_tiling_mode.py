"""Seamless-texture tiling mode (A1111 ``--tiling``): every conv pads
circularly (periodic boundary), so generated images tile edge-to-edge.

The defining property is exact translation equivariance under periodic
shifts: with circular padding the WHOLE network commutes with jnp.roll
(convs by construction; GroupNorm is global; attention is
permutation-equivariant over the flattened spatial axis) — with zero
padding it does not.  No reference analog.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.ops import conv

H = W = 16
N_STEPS = 2


def test_conv_circular_roll_equivariance():
    key = jax.random.PRNGKey(0)
    p = conv.init(key, 4, 8, 3)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    with conv.circular_padding():
        y = conv.apply(p, x, padding=1)
        y_roll = conv.apply(p, jnp.roll(x, (3, 5), axis=(1, 2)), padding=1)
    np.testing.assert_allclose(np.asarray(jnp.roll(y, (3, 5), axis=(1, 2))),
                               np.asarray(y_roll), rtol=1e-5, atol=1e-6)
    # zero padding breaks it
    y0 = conv.apply(p, x, padding=1)
    y0_roll = conv.apply(p, jnp.roll(x, (3, 5), axis=(1, 2)), padding=1)
    assert np.abs(np.asarray(jnp.roll(y0, (3, 5), axis=(1, 2)))
                  - np.asarray(y0_roll)).max() > 1e-3


def test_unet_roll_equivariant_under_tiling(tiny_cfg, tiny_models):
    """Roll by a multiple of the total downsample stride commutes with the
    FULL UNet when every conv is circular."""
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context))

    def f(p, l, c):
        with conv.circular_padding():
            return unet_mod.apply(p, l, c, 500, tiny_cfg.unet)

    f = jax.jit(f)
    y = f(tiny_models["diffusion"], lat, ctx)
    y_roll = f(tiny_models["diffusion"], jnp.roll(lat, (2, 4), axis=(1, 2)),
               ctx)
    np.testing.assert_allclose(np.asarray(jnp.roll(y, (2, 4), axis=(1, 2))),
                               np.asarray(y_roll), rtol=2e-4, atol=2e-5)


def test_pipeline_tiling(tiny_models, tiny_tokenizer, tiny_cfg):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    img_t = sdt.generate("a cat", tiling=True, **kw)
    img_p = sdt.generate("a cat", **kw)
    assert img_t.shape == (H, W, 3)
    assert (img_t != img_p).any()
    # contextvar does not leak: a plain call after a tiling call matches
    # the original plain call bitwise
    np.testing.assert_array_equal(sdt.generate("a cat", **kw), img_p)
