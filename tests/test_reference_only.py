"""Reference-only guidance (the A1111 ControlNet "reference"
preprocessor, attention mode — no trained weights involved).

Semantics: a capture UNet pass on the re-noised reference latents banks
each self-attention layer's pre-attention hidden states; the main pass
attends over [own, reference] tokens; ``style_fidelity`` lerps the
uncond lane back toward plain self-attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import unet as unet_mod
from pytorch_stable_diffusion_tpu.ops import attention


# ------------------------------------------------------------- attn level
def test_block_read_own_bank_matches_plain_attention():
    """Through the REAL block path: capture on x then read on the SAME x
    means every layer attends over its own tokens duplicated along the KV
    axis — softmax weights halve, the average is unchanged, so the block
    output must match plain self-attention (ref=None) up to reduction
    noise.  Definition check for the read path itself (the round-3 version
    of this test compared the duplicated-KV computation against itself)."""
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32

    key = jax.random.PRNGKey(0)
    p = unet_mod.init_attn_block(key, 16, 24)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 4, 4, 16))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2, 5, 24))
    kw = dict(n_heads=2, groups=4, policy=FP32, fuse_qkv=False)
    plain = unet_mod.apply_attn_block(p, x, ctx, **kw)
    bank = {}
    cap = unet_mod.apply_attn_block(p, x, ctx, **kw,
                                    ref=("capture", bank), ref_key="blk")
    assert set(bank) == {"blk_0"} and bank["blk_0"].shape == (2, 16, 16)
    # capture mode's own output is plain attention (it only banks t)
    np.testing.assert_allclose(np.asarray(cap), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)
    read = unet_mod.apply_attn_block(p, x, ctx, **kw,
                                     ref=("read", bank, 0.0, None),
                                     ref_key="blk")
    np.testing.assert_allclose(np.asarray(read), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
    # and a DIFFERENT bank must change the output (read really reads)
    other = {"blk_0": jnp.asarray(
        np.random.RandomState(3).randn(2, 16, 16).astype(np.float32))}
    far = unet_mod.apply_attn_block(p, x, ctx, **kw,
                                    ref=("read", other, 0.0, None),
                                    ref_key="blk")
    assert np.abs(np.asarray(far) - np.asarray(plain)).max() > 1e-4


# ------------------------------------------------------------- unet level
def test_unet_capture_banks_every_self_attn(tiny_cfg, tiny_models):
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (1, tiny_cfg.clip.max_len, cfg.d_context))
    bank = {}
    unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg,
                   ref=("capture", bank))
    from pytorch_stable_diffusion_tpu.weights.ip_adapter import ip_layer_plan

    assert set(bank) == set(ip_layer_plan(cfg))  # same attn-layer universe
    for v in bank.values():
        assert v.ndim == 3 and v.shape[0] == 1

    base = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg)
    # reading a bank captured from the SAME latents means attending over
    # duplicated keys — mathematically identical to plain attention
    # (softmax weights halve, the average is unchanged) at every layer
    self_read = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500,
                               cfg, ref=("read", bank, jnp.float32(0.0),
                                         None))
    np.testing.assert_allclose(np.asarray(self_read), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    # a bank captured from DIFFERENT latents steers the output
    bank2 = {}
    unet_mod.apply(tiny_models["diffusion"],
                   jax.random.normal(jax.random.fold_in(key, 9),
                                     (1, 8, 8, 4)),
                   ctx, 500, cfg, ref=("capture", bank2))
    read = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg,
                          ref=("read", bank2, jnp.float32(0.0), None))
    assert np.abs(np.asarray(read) - np.asarray(base)).max() > 1e-5


def test_unet_read_fidelity_one_masks_back_to_plain(tiny_cfg, tiny_models):
    """With style_fidelity 1 and an all-ones mask, every lane collapses to
    plain self-attention — bit-comparable to the no-ref forward."""
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(3)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, tiny_cfg.clip.max_len, cfg.d_context))
    bank = {}
    unet_mod.apply(tiny_models["diffusion"],
                   jax.random.normal(jax.random.fold_in(key, 4),
                                     (2, 8, 8, 4)),
                   ctx, 500, cfg, ref=("capture", bank))
    base = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg)
    masked = unet_mod.apply(tiny_models["diffusion"], lat, ctx, 500, cfg,
                            ref=("read", bank, jnp.float32(1.0),
                                 jnp.ones((2,), jnp.float32)))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(base),
                               rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------ adain mode
def test_unet_adain_banks_every_site(tiny_cfg, tiny_models):
    """reference_adain banks (mean, var) after every encoder/decoder
    res(+attn) stage and the bottleneck; reading a bank captured from the
    SAME latents is the AdaIN identity ((x-m)/s*s+m == x)."""
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, tiny_cfg.clip.max_len, cfg.d_context))
    p = tiny_models["diffusion"]
    abank = {}
    unet_mod.apply(p, lat, ctx, 500, cfg, ref_adain=("capture", abank))
    expected = {f"enc_{i}" for i, st in enumerate(p["encoder"])
                if "down" not in st}
    expected |= {"mid"}
    expected |= {f"dec_{i}" for i in range(len(p["decoder"]))}
    assert set(abank) == expected
    for m, v in abank.values():
        assert m.shape[1:3] == (1, 1) and v.shape == m.shape
        assert np.all(np.asarray(v) >= 0.0)

    base = unet_mod.apply(p, lat, ctx, 500, cfg)
    self_read = unet_mod.apply(p, lat, ctx, 500, cfg,
                               ref_adain=("read", abank, jnp.float32(0.0),
                                          None))
    np.testing.assert_allclose(np.asarray(self_read), np.asarray(base),
                               rtol=1e-4, atol=1e-5)
    # a bank captured from DIFFERENT latents steers the output
    abank2 = {}
    unet_mod.apply(p, jax.random.normal(jax.random.fold_in(key, 9),
                                        (2, 8, 8, 4)),
                   ctx, 500, cfg, ref_adain=("capture", abank2))
    read = unet_mod.apply(p, lat, ctx, 500, cfg,
                          ref_adain=("read", abank2, jnp.float32(0.0),
                                     None))
    assert np.abs(np.asarray(read) - np.asarray(base)).max() > 1e-5


def test_unet_adain_fidelity_one_masks_back_to_plain(tiny_cfg, tiny_models):
    """With style_fidelity 1 and an all-ones mask every lane keeps its
    plain features (the published uc_mask semantics: x_c[uc] = x[uc],
    final = fidelity*x_c + (1-fidelity)*x_uc)."""
    cfg = tiny_cfg.unet
    key = jax.random.PRNGKey(3)
    lat = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.fold_in(key, 2),
                            (2, tiny_cfg.clip.max_len, cfg.d_context))
    p = tiny_models["diffusion"]
    abank = {}
    unet_mod.apply(p, jax.random.normal(jax.random.fold_in(key, 4),
                                        (2, 8, 8, 4)),
                   ctx, 500, cfg, ref_adain=("capture", abank))
    base = unet_mod.apply(p, lat, ctx, 500, cfg)
    masked = unet_mod.apply(p, lat, ctx, 500, cfg,
                            ref_adain=("read", abank, jnp.float32(1.0),
                                       jnp.ones((2,), jnp.float32)))
    np.testing.assert_allclose(np.asarray(masked), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
    # a half mask applies AdaIN only to the unmasked lane
    half = unet_mod.apply(p, lat, ctx, 500, cfg,
                          ref_adain=("read", abank, jnp.float32(1.0),
                                     jnp.asarray([0.0, 1.0], jnp.float32)))
    h, b = np.asarray(half), np.asarray(base)
    np.testing.assert_allclose(h[1], b[1], rtol=2e-5, atol=2e-5)
    assert np.abs(h[0] - b[0]).max() > 1e-5


def test_adain_transform_matches_published_formula():
    """Numpy oracle of the diffusers community stable_diffusion_reference
    read transform (derived from the PUBLISHED algorithm text):
    ``std = max(var, 1e-6) ** 0.5`` on both sides,
    ``x_uc = (x - mean)/std * std_acc + mean_acc``,
    ``x_c[uc_mask] = x[uc_mask]``,
    ``x = fidelity * x_c + (1 - fidelity) * x_uc``."""
    rs = np.random.RandomState(0)
    x = rs.randn(2, 4, 4, 3).astype(np.float32)
    # include a near-constant channel so the 1e-6 eps clamp is exercised
    x[:, :, :, 2] = 0.5
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    m_ref = rs.randn(2, 1, 1, 3).astype(np.float32)
    v_ref = np.abs(rs.randn(2, 1, 1, 3)).astype(np.float32)
    v_ref[:, :, :, 1] = 0.0  # zero reference variance hits the clamp too
    fidelity = 0.7
    mask = np.asarray([0.0, 1.0], np.float32)

    std = np.sqrt(np.maximum(var, 1e-6))
    std_ref = np.sqrt(np.maximum(v_ref, 1e-6))
    x_uc = (x - mean) / std * std_ref + m_ref
    x_c = x_uc.copy()
    x_c[1] = x[1]  # uc_mask lane keeps plain features
    want = fidelity * x_c + (1.0 - fidelity) * x_uc

    got = unet_mod.adain_transform(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var),
        jnp.asarray(m_ref), jnp.asarray(v_ref), jnp.float32(fidelity),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
    # no mask -> pure AdaIN for every lane
    got0 = unet_mod.adain_transform(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var),
        jnp.asarray(m_ref), jnp.asarray(v_ref), jnp.float32(fidelity), None)
    np.testing.assert_allclose(np.asarray(got0), x_uc, rtol=1e-6, atol=1e-6)


# ------------------------------------------------------------- pipeline
def test_pipeline_reference_only(tiny_cfg, tiny_models, tiny_tokenizer):
    ref = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2, seed=3,
              return_latents=True)
    base_img, base_lat = sdt.generate("a photo of a dog", **kw)
    img, lat = sdt.generate("a photo of a dog", reference_image=ref,
                            reference_fidelity=0.5, **kw)
    assert img.shape == base_img.shape
    assert np.abs(lat - base_lat).max() > 1e-5
    # deterministic
    _, lat2 = sdt.generate("a photo of a dog", reference_image=ref,
                           reference_fidelity=0.5, **kw)
    np.testing.assert_array_equal(lat, lat2)
    # fidelity is traced: a different value reuses the compile and changes
    # the output
    _, lat3 = sdt.generate("a photo of a dog", reference_image=ref,
                           reference_fidelity=0.0, **kw)
    assert np.abs(lat3 - lat).max() > 1e-6


def test_pipeline_reference_adain_modes(tiny_cfg, tiny_models,
                                        tiny_tokenizer):
    ref = (np.random.RandomState(2).rand(16, 16, 3) * 255).astype(np.uint8)
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2, seed=3,
              return_latents=True)
    _, base_lat = sdt.generate("a photo of a dog", **kw)
    _, attn_lat = sdt.generate("a photo of a dog", reference_image=ref,
                               reference_fidelity=0.5, **kw)
    _, adain_lat = sdt.generate("a photo of a dog", reference_image=ref,
                                reference_fidelity=0.5,
                                reference_mode="adain", **kw)
    _, both_lat = sdt.generate("a photo of a dog", reference_image=ref,
                               reference_fidelity=0.5,
                               reference_mode="adain+attn", **kw)
    # each mode is a distinct graph with distinct steering
    for lat in (attn_lat, adain_lat, both_lat):
        assert np.abs(lat - base_lat).max() > 1e-5
    assert np.abs(adain_lat - attn_lat).max() > 1e-5
    assert np.abs(both_lat - attn_lat).max() > 1e-5
    assert np.abs(both_lat - adain_lat).max() > 1e-5
    # "attn+adain" is the same static graph as "adain+attn" (canonicalized
    # before the compile cache key) and bit-reproduces it
    _, both2 = sdt.generate("a photo of a dog", reference_image=ref,
                            reference_fidelity=0.5,
                            reference_mode="attn+adain", **kw)
    np.testing.assert_array_equal(both2, both_lat)
    # adain mode is deterministic too
    _, adain2 = sdt.generate("a photo of a dog", reference_image=ref,
                             reference_fidelity=0.5,
                             reference_mode="adain", **kw)
    np.testing.assert_array_equal(adain2, adain_lat)


def test_pipeline_reference_mode_validation(tiny_cfg, tiny_models,
                                            tiny_tokenizer):
    ref = np.zeros((16, 16, 3), np.uint8)
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2)
    with pytest.raises(ValueError, match="reference_mode"):
        sdt.generate("a dog", reference_image=ref,
                     reference_mode="never_a_real_reference_mode", **kw)


def test_pipeline_reference_rejects_combos(tiny_cfg, tiny_models,
                                           tiny_tokenizer):
    ref = np.zeros((16, 16, 3), np.uint8)
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2)
    with pytest.raises(ValueError, match="PAG"):
        sdt.generate("a dog", reference_image=ref, pag_scale=2.0, **kw)
    with pytest.raises(ValueError, match="deepcache"):
        sdt.generate("a dog", reference_image=ref, deepcache=2, **kw)
    with pytest.raises(ValueError, match="fidelity"):
        sdt.generate("a dog", reference_image=ref,
                     reference_fidelity=1.5, **kw)
