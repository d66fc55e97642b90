"""A1111 variation seeds (subseed + subseed_strength).

No reference analog (the reference draws a single init noise from its
generator, ``/root/reference/sd/pipeline.py:92-98``); semantics follow
A1111's ``modules/processing.py`` subseed scheme: the init noise is the
per-sample spherical interpolation between the base seed's draw and the
variation seed's draw.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.pipeline import slerp_noise

H = W = 16
N_STEPS = 3


# ------------------------------------------------------------ slerp helper
def test_slerp_endpoints_bitwise():
    k = jax.random.PRNGKey(0)
    low = jax.random.normal(k, (2, 4, 4, 4), jnp.float32)
    high = jax.random.normal(jax.random.fold_in(k, 1), (2, 4, 4, 4),
                             jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(slerp_noise(jnp.float32(0.0), low, high)), np.asarray(low))
    np.testing.assert_array_equal(
        np.asarray(slerp_noise(jnp.float32(1.0), low, high)), np.asarray(high))


def test_slerp_midpoint_stays_on_shell():
    # gaussian draws are near-orthogonal in high dim; the slerp midpoint's
    # norm must stay near the endpoints' (a lerp midpoint would shrink ~30%)
    k = jax.random.PRNGKey(1)
    low = jax.random.normal(k, (1, 16, 16, 4), jnp.float32)
    high = jax.random.normal(jax.random.fold_in(k, 1), (1, 16, 16, 4),
                             jnp.float32)
    mid = np.asarray(slerp_noise(jnp.float32(0.5), low, high))
    n_mid = np.linalg.norm(mid)
    n_ref = 0.5 * (np.linalg.norm(np.asarray(low))
                   + np.linalg.norm(np.asarray(high)))
    assert abs(n_mid - n_ref) / n_ref < 0.05
    lerp = 0.5 * np.asarray(low) + 0.5 * np.asarray(high)
    assert np.linalg.norm(lerp) < 0.85 * n_ref


def test_slerp_parallel_fallback_is_finite():
    low = jnp.ones((1, 8), jnp.float32)
    out = np.asarray(slerp_noise(jnp.float32(0.3), low, low * 2.0))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 1.3 * np.ones((1, 8)), rtol=1e-6)


# --------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, **kw):
    kw.setdefault("sampler_name", "ddim")  # eta 0: trajectory is a pure
    # function of the init noise, so seed equivalences are exact
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, return_latents=True, **kw)


def test_strength_one_equals_variation_seed(tiny_models, tiny_tokenizer,
                                            tiny_cfg):
    img_a, lat_a = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
                        variation_seed=2, variation_strength=1.0)
    img_b, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=2)
    # identical values enter the loop; programs differ (slerp ops), so
    # allow reduction-order noise downstream
    np.testing.assert_allclose(np.asarray(lat_a), np.asarray(lat_b),
                               atol=1e-4, rtol=0)
    assert np.max(np.abs(img_a.astype(np.int32) - img_b.astype(np.int32))) <= 1


def test_intermediate_strength_differs_from_both(tiny_models, tiny_tokenizer,
                                                 tiny_cfg):
    img_m, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
                    variation_seed=2, variation_strength=0.5)
    img_a, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1)
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=2)
    assert np.mean(np.abs(img_m.astype(np.float32) - img_a)) > 1.0
    assert np.mean(np.abs(img_m.astype(np.float32) - img_b)) > 1.0


def test_zero_strength_is_noop_graph(tiny_models, tiny_tokenizer, tiny_cfg):
    # strength 0 disables variation entirely -> same compiled graph, same
    # bits as no variation args at all
    img_a, lat_a = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
                        variation_seed=7, variation_strength=0.0)
    img_b, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1)
    np.testing.assert_array_equal(np.asarray(lat_a), np.asarray(lat_b))
    np.testing.assert_array_equal(img_a, img_b)


def test_variation_img2img(tiny_models, tiny_tokenizer, tiny_cfg):
    init = np.zeros((H, W, 3), np.uint8)
    img_v, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
                    variation_seed=2, variation_strength=0.7,
                    input_image=init, strength=0.8)
    img_p, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
                    input_image=init, strength=0.8)
    assert img_v.shape == (H, W, 3)
    assert np.mean(np.abs(img_v.astype(np.float32) - img_p)) > 0.5


def test_variation_strength_range_validated(tiny_models, tiny_tokenizer,
                                            tiny_cfg):
    with pytest.raises(ValueError, match="variation_strength"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, seed=1,
             variation_seed=2, variation_strength=1.5)
