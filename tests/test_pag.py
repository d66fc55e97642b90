"""Perturbed-Attention Guidance (Ahn et al. 2024).

No reference analog; semantics follow diffusers' StableDiffusionPAGPipeline
with the default ``pag_applied_layers=["mid"]``: the perturbed branch runs
the mid-block self-attention with an identity attention map, and the
prediction gains ``pag_scale * (eps_cond - eps_perturbed)`` on top of CFG.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.ops import attention

H = W = 16
N_STEPS = 3


# ------------------------------------------------------------- op level
def test_identity_attention_equals_full_at_seq_len_one():
    # with a single token, softmax over one key is 1 -> full attention IS
    # the identity map, so both paths must agree
    key = jax.random.PRNGKey(0)
    p = attention.init(key, 2, 16)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 1, 16))
    full = attention.apply(p, x, n_heads=2)
    ident = attention.apply_identity(p, x)
    np.testing.assert_allclose(np.asarray(full), np.asarray(ident),
                               rtol=1e-5, atol=1e-6)


def test_identity_attention_ignores_other_tokens():
    # token i's output depends only on token i
    key = jax.random.PRNGKey(1)
    p = attention.init(key, 2, 16)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, 4, 16))
    y = np.asarray(attention.apply_identity(p, x))
    x2 = x.at[:, 1:].set(0.0)  # clobber every other token
    y2 = np.asarray(attention.apply_identity(p, x2))
    np.testing.assert_array_equal(y[:, 0], y2[:, 0])


# ------------------------------------------------------------ unet level
def test_unet_pag_branch_differs(tiny_cfg, tiny_models):
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context))

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def run(p, lat, ctx, pag):
        return unet_mod.apply(p, lat, ctx, 500, tiny_cfg.unet, pag=pag)

    base = np.asarray(run(tiny_models["diffusion"], lat, ctx, False))
    ptb = np.asarray(run(tiny_models["diffusion"], lat, ctx, True))
    assert np.all(np.isfinite(ptb))
    assert base.shape == ptb.shape
    assert np.mean(np.abs(base - ptb)) > 1e-4


# --------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, return_latents=True, **kw)


def test_pag_zero_scale_is_noop(tiny_models, tiny_tokenizer, tiny_cfg):
    img_a, lat_a = _gen(tiny_models, tiny_tokenizer, tiny_cfg, pag_scale=0.0)
    img_b, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    np.testing.assert_array_equal(np.asarray(lat_a), np.asarray(lat_b))
    np.testing.assert_array_equal(img_a, img_b)


def test_pag_changes_output(tiny_models, tiny_tokenizer, tiny_cfg):
    img_p, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, pag_scale=3.0)
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    assert np.mean(np.abs(img_p.astype(np.float32) - img_b)) > 0.5


def test_pag_without_cfg(tiny_models, tiny_tokenizer, tiny_cfg):
    img_p, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, pag_scale=2.0,
                    do_cfg=False)
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, do_cfg=False)
    assert img_p.shape == (H, W, 3)
    assert np.mean(np.abs(img_p.astype(np.float32) - img_b)) > 0.5


def test_pag_composes_with_deepcache(tiny_models, tiny_tokenizer, tiny_cfg):
    # the perturbed eval always runs the full (perturbed) UNet; only the
    # main eval rides the DeepCache carry — the combo must run and differ
    # from plain deepcache
    img_pd, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, pag_scale=2.0,
                     deepcache=2)
    img_d, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, deepcache=2)
    assert np.mean(np.abs(img_pd.astype(np.float32) - img_d)) > 0.5


def test_pag_img2img(tiny_models, tiny_tokenizer, tiny_cfg):
    init = np.zeros((H, W, 3), np.uint8)
    img, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, pag_scale=1.5,
                  input_image=init, strength=0.8)
    assert img.shape == (H, W, 3)
