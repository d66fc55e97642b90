"""FreeU (Si et al. 2023): training-free decoder re-weighting.

No reference analog (the reference UNet concatenates skips untouched,
``/root/reference/sd/diffusion.py:658-673``); semantics follow the paper
/ diffusers ``enable_freeu``: at the two deepest decoder levels, the first
half of the backbone channels scales by b_i and the skip connection's
lowest-frequency Fourier band attenuates by s_i.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models.config import (
    FREEU_DEFAULTS_SD, FREEU_DEFAULTS_SDXL, sd15_config, sdxl_config,
    with_freeu)
from pytorch_stable_diffusion_tpu.models.unet import _fourier_lowpass_scale

H = W = 16
N_STEPS = 2


# ------------------------------------------------------------ config level
def test_with_freeu_defaults():
    assert with_freeu(sd15_config()).unet.freeu == FREEU_DEFAULTS_SD
    assert with_freeu(sdxl_config()).unet.freeu == FREEU_DEFAULTS_SDXL
    cfg = sd15_config()
    assert with_freeu(cfg, None) is cfg and with_freeu(cfg, False) is cfg
    assert with_freeu(cfg, (1.2, 1.3, 0.8, 0.3)).unet.freeu == \
        (1.2, 1.3, 0.8, 0.3)
    with pytest.raises(ValueError):
        with_freeu(cfg, (1.0, 1.0))


# ------------------------------------------------------------ filter level
def test_lowpass_scale_on_constant():
    """A constant map has all its energy at DC, so the whole map scales."""
    x = jnp.full((1, 8, 8, 3), 2.5, jnp.float32)
    out = np.asarray(_fourier_lowpass_scale(x, 0.25))
    np.testing.assert_allclose(out, 0.625, rtol=1e-5)


def test_lowpass_scale_identity_and_selectivity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_fourier_lowpass_scale(x, 1.0)),
                               np.asarray(x), atol=1e-5)
    # a pure high-frequency (Nyquist checkerboard) signal passes untouched
    hf = jnp.asarray(np.indices((8, 8)).sum(0) % 2 * 2.0 - 1.0,
                     jnp.float32)[None, :, :, None]
    np.testing.assert_allclose(np.asarray(_fourier_lowpass_scale(hf, 0.1)),
                               np.asarray(hf), atol=1e-5)


# ---------------------------------------------------------- pipeline level
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, **kw)


def test_pipeline_freeu(tiny_cfg, tiny_models, tiny_tokenizer):
    base = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    neutral = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                   freeu=(1.0, 1.0, 1.0, 1.0))
    np.testing.assert_array_equal(base, neutral)  # short-circuits to off

    on = _gen(tiny_models, tiny_tokenizer, tiny_cfg, freeu=True)
    assert np.abs(on.astype(np.int32) - base.astype(np.int32)).max() > 0
    # kwarg sugar == config-level rewrite
    manual = _gen(tiny_models, tiny_tokenizer, with_freeu(tiny_cfg))
    np.testing.assert_array_equal(on, manual)
