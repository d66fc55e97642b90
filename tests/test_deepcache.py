"""DeepCache (Ma et al. 2023): cached-deep-feature UNet steps.

No reference analog (the reference runs the full UNet every step,
``/root/reference/sd/pipeline.py:206-238``).  The split contract: with
identical inputs, a shallow step fed the full step's cache reproduces the
full forward EXACTLY — approximation error comes only from feature reuse
across timesteps, controlled by the refresh interval.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.models.config import UNetConfig

H = W = 16
N_STEPS = 4


# -------------------------------------------------------------- unet level
def test_shallow_step_with_fresh_cache_is_exact(tiny_cfg, tiny_models):
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context))

    @jax.jit
    def full(p, lat, ctx):
        return unet_mod.apply(p, lat, ctx, 500, tiny_cfg.unet,
                              return_cache=True)

    @jax.jit
    def shallow(p, lat, ctx, cache):
        return unet_mod.apply(p, lat, ctx, 500, tiny_cfg.unet, cache=cache)

    out_full, cache = full(tiny_models["diffusion"], lat, ctx)
    assert cache.shape == unet_mod.deepcache_shape(tiny_cfg.unet, 2, 8, 8)
    out_shallow = shallow(tiny_models["diffusion"], lat, ctx, cache)
    np.testing.assert_array_equal(np.asarray(out_full),
                                  np.asarray(out_shallow))


def test_deepcache_shape_validation():
    cfg = UNetConfig(model_channels=16, ch_mults=(1,), attn_levels=(True,),
                     d_context=32, groups=4)
    with pytest.raises(ValueError):
        unet_mod.deepcache_shape(cfg, 1, 8, 8)


# ---------------------------------------------------------- pipeline level
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, **kw)


def test_interval_one_matches_off(tiny_cfg, tiny_models, tiny_tokenizer):
    """N=1 refreshes every step — the cond always takes the full branch, so
    the result must match the uncached pipeline."""
    base = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    exact = _gen(tiny_models, tiny_tokenizer, tiny_cfg, deepcache=1)
    np.testing.assert_array_equal(base, exact)


def test_interval_two_approximates(tiny_cfg, tiny_models, tiny_tokenizer):
    base = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    fast = _gen(tiny_models, tiny_tokenizer, tiny_cfg, deepcache=2)
    again = _gen(tiny_models, tiny_tokenizer, tiny_cfg, deepcache=2)
    np.testing.assert_array_equal(fast, again)  # deterministic
    assert np.isfinite(fast.astype(np.float64)).all()
    assert np.abs(fast.astype(np.int32) - base.astype(np.int32)).max() > 0


def test_deepcache_dpm_and_img2img(tiny_cfg, tiny_models, tiny_tokenizer):
    img = np.random.default_rng(3).integers(
        0, 255, (H, W, 3), np.uint8)
    out = sdt.generate("a cat", "", models=tiny_models,
                       tokenizer=tiny_tokenizer, config=tiny_cfg,
                       n_inference_steps=N_STEPS, height=H, width=W,
                       seed=0, sampler_name="dpm++", input_image=img,
                       strength=0.9, deepcache=2)
    assert out.shape == (H, W, 3) and np.isfinite(
        out.astype(np.float64)).all()


def test_invalid_interval(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, deepcache=0)
