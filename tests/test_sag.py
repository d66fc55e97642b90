"""Self-Attention Guidance (Hong et al. 2023; diffusers
StableDiffusionSAGPipeline semantics).

No reference analog.  Per step: capture the mid-block self-attention map,
blur pred_x0 where the per-key attention mass exceeds 1, re-noise with the
predicted eps, re-evaluate the base lane (uncond under CFG) on the degraded
latents, and add ``sag_scale * (eps_base - eps_degraded)``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.ops import attention
from pytorch_stable_diffusion_tpu.pipeline import gaussian_blur

H = W = 16
N_STEPS = 3


# ------------------------------------------------------------- op level
def test_gaussian_blur_preserves_constants_and_smooths():
    x = jnp.full((1, 12, 12, 4), 3.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(gaussian_blur(x)), 3.5, rtol=1e-5)
    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.randn(2, 16, 16, 4), jnp.float32)
    blurred = np.asarray(gaussian_blur(y))
    assert blurred.shape == y.shape
    assert blurred.std() < 0.6 * np.asarray(y).std()
    # mean preserved (kernel normalized, reflect padding)
    np.testing.assert_allclose(blurred.mean(), np.asarray(y).mean(),
                               atol=0.02)


def test_attention_return_probs_consistent():
    key = jax.random.PRNGKey(0)
    p = attention.init(key, 2, 16)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 16))
    out_plain = attention.apply(p, x, n_heads=2)
    out, probs = attention.apply(p, x, n_heads=2, return_probs=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-6)
    assert probs.shape == (2, 2, 8, 8)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


# ------------------------------------------------------------ unet level
def test_unet_return_mid_attn(tiny_cfg, tiny_models):
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context))
    out, probs = jax.jit(
        lambda p, l, c: unet_mod.apply(p, l, c, 500, tiny_cfg.unet,
                                       return_mid_attn=True)
    )(tiny_models["diffusion"], lat, ctx)
    plain = jax.jit(
        lambda p, l, c: unet_mod.apply(p, l, c, 500, tiny_cfg.unet)
    )(tiny_models["diffusion"], lat, ctx)
    # tiny cfg: 2 levels -> mid at 4x4 = 16 tokens
    assert probs.shape[0] == 2 and probs.shape[-1] == 16
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=2e-4, atol=2e-5)


def test_unet_mid_attn_rejects_deepcache(tiny_cfg, tiny_models):
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context))
    with pytest.raises(ValueError, match="DeepCache"):
        unet_mod.apply(tiny_models["diffusion"], lat, ctx, 0, tiny_cfg.unet,
                       return_mid_attn=True, return_cache=True)


# -------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, return_latents=True, **kw)


def test_sag_zero_scale_is_noop(tiny_models, tiny_tokenizer, tiny_cfg):
    img_a, lat_a = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.0)
    img_b, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    np.testing.assert_array_equal(np.asarray(lat_a), np.asarray(lat_b))
    np.testing.assert_array_equal(img_a, img_b)


def test_sag_changes_output(tiny_models, tiny_tokenizer, tiny_cfg):
    img_s, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=1.0)
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    assert np.mean(np.abs(img_s.astype(np.float32) - img_b)) > 0.5


def test_sag_without_cfg_and_with_pag(tiny_models, tiny_tokenizer, tiny_cfg):
    img_n, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.75,
                    do_cfg=False)
    assert img_n.shape == (H, W, 3)
    img_sp, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.75,
                     pag_scale=1.0)
    img_s, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.75)
    assert (img_sp != img_s).any()


def test_sag_img2img(tiny_models, tiny_tokenizer, tiny_cfg):
    init = np.zeros((H, W, 3), np.uint8)
    img, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.5,
                  input_image=init, strength=0.8)
    assert img.shape == (H, W, 3)


def test_sag_rejects_deepcache(tiny_models, tiny_tokenizer, tiny_cfg):
    with pytest.raises(ValueError, match="deepcache"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, sag_scale=0.5,
             deepcache=2)
