"""A1111-convention CLIP skip (models/config.with_clip_skip).

The reference has no such knob (its CLIP always runs all 12 layers + the
final LN, ``/root/reference/sd/clip.py:84-96``); semantics follow the
A1111 webui standard: clip_skip=1 is the family default, each increment
conditions the UNet one text-encoder layer earlier, and SD-1.x applies
the final LayerNorm to the truncated hidden (the webui behavior).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models.config import (
    sd15_config, sd21_config, sdxl_config, sdxl_refiner_config,
    with_clip_skip)

from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

H = W = 16
N_STEPS = 2


# ------------------------------------------------------------ config level
def test_identity_at_one():
    cfg = sd15_config()
    assert with_clip_skip(cfg, 1) is cfg


def test_family_mappings():
    # SD-1.5: default = full 12-layer stack; 2 = penultimate + final LN
    c = with_clip_skip(sd15_config(), 2)
    assert c.clip.stop_at_layer == 11 and c.clip.penultimate_norm
    # SD-2.1: default already penultimate (23 of 24); 2 = antepenultimate
    c = with_clip_skip(sd21_config(), 2)
    assert c.clip.stop_at_layer == 22 and c.clip.penultimate_norm
    # SDXL: both towers shift, raw-hidden contract preserved
    c = with_clip_skip(sdxl_config(), 3)
    assert c.clip.stop_at_layer == 9 and not c.clip.penultimate_norm
    assert c.clip2.stop_at_layer == 29 and not c.clip2.penultimate_norm
    # refiner: single tower, clip2 stays absent
    c = with_clip_skip(sdxl_refiner_config(), 2)
    assert c.clip.stop_at_layer == 30 and c.clip2 is None


def test_invalid_values():
    with pytest.raises(ValueError):
        with_clip_skip(sd15_config(), 0)
    with pytest.raises(ValueError):
        with_clip_skip(sd15_config(), 13)  # skips past all 12 layers
    assert with_clip_skip(sd15_config(), 12).clip.stop_at_layer == 1


# ------------------------------------------------------------ module level
def test_truncated_stack_equals_shorter_model(tiny_cfg, tiny_models):
    """stop_at_layer=k + penultimate_norm is EXACTLY a k-layer encoder:
    running the 2-layer tiny tower with clip_skip=2 must bit-match a
    1-layer model built from the same leading parameters."""
    skip_tower = with_clip_skip(tiny_cfg, 2).clip
    toks = jnp.asarray([[3, 5, 7] + [9] * (tiny_cfg.clip.max_len - 3)],
                       jnp.int32)
    out = clip_mod.apply(tiny_models["clip"], toks, skip_tower)

    short_params = dict(tiny_models["clip"],
                        layers=tiny_models["clip"]["layers"][:1])
    short_cfg = dataclasses.replace(tiny_cfg.clip, n_layers=1)
    ref = clip_mod.apply(short_params, toks, short_cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    full = clip_mod.apply(tiny_models["clip"], toks, tiny_cfg.clip)
    assert not np.allclose(np.asarray(out), np.asarray(full))


def test_sdxl_pooled_unaffected():
    """The pooled embedding always comes from the FULL stack (diffusers
    semantics) — clip_skip moves only the hidden-state tap."""
    base = tiny_sdxl_config()
    # give the towers room to skip: condition on the full stack by default
    base = dataclasses.replace(
        base,
        clip=dataclasses.replace(base.clip, stop_at_layer=2),
        clip2=dataclasses.replace(base.clip2, stop_at_layer=3))
    skipped = with_clip_skip(base, 2)
    params = clip_mod.init(jax.random.PRNGKey(11), base.clip2)
    toks = jnp.asarray([[1023, 5, 6, 1022] + [1022] * 12], jnp.int32)
    h0, p0 = clip_mod.apply_with_pooled(params, toks, base.clip2)
    h1, p1 = clip_mod.apply_with_pooled(params, toks, skipped.clip2)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert not np.allclose(np.asarray(h0), np.asarray(h1))


# ---------------------------------------------------------- pipeline level
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, **kw)


def test_pipeline_clip_skip(tiny_cfg, tiny_models, tiny_tokenizer):
    base = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    one = _gen(tiny_models, tiny_tokenizer, tiny_cfg, clip_skip=1)
    np.testing.assert_array_equal(base, one)

    two = _gen(tiny_models, tiny_tokenizer, tiny_cfg, clip_skip=2)
    assert np.abs(two.astype(np.int32) - base.astype(np.int32)).max() > 0
    # the kwarg is pure sugar over a reconfigured tower
    manual = _gen(tiny_models, tiny_tokenizer,
                  with_clip_skip(tiny_cfg, 2))
    np.testing.assert_array_equal(two, manual)
