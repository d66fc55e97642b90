"""AOT export/deserialize of the compiled generation program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.utils import aot

N_STEPS = 2
H = W = 16


def test_export_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W)
    assert isinstance(blob, bytes) and len(blob) > 1000

    loaded = aot.load_pipeline(blob)
    assert "cpu" in loaded.platforms

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    key = jax.random.PRNGKey(5)
    images, latents = loaded(tiny_models, toks, un, key, 7.5)
    assert images.shape == (1, H, W, 3) and images.dtype == np.uint8

    # must equal the live pipeline bit-for-bit (same program, same inputs)
    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=tiny_models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W)
    np.testing.assert_array_equal(images[0], live)


def test_export_img2img_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """Round 3: the serving artifact covers img2img (VAE encode +
    traced start_step strength), matching the live pipeline bit-for-bit."""
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W, img2img=True)
    loaded = aot.load_pipeline(blob)
    assert loaded.image_shape == (1, H, W, 3)

    rng = np.random.RandomState(3)
    img_u8 = rng.randint(0, 256, size=(H, W, 3)).astype(np.uint8)

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.sampling import ddpm as ddpm_mod

    strength = 0.8
    live = sdt.generate("a cat", "", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, input_image=img_u8,
                        strength=strength)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    start = ddpm_mod.start_step_for_strength(N_STEPS, strength)
    image_f = (img_u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    images, _ = loaded(tiny_models, toks, un, jax.random.PRNGKey(5), 7.5,
                       start_step=start, input_image=image_f[None])
    np.testing.assert_array_equal(images[0], live)


def test_export_sampler_and_tile_variants(tiny_cfg, tiny_models,
                                          tiny_tokenizer):
    """Every BASELINE config knob exports: alternative samplers, eta,
    tiled decode."""
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    key = jax.random.PRNGKey(1)

    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               height=H, width=W, sampler="ddim",
                               ddim_eta=0.5)
    images, _ = aot.load_pipeline(blob)(tiny_models, toks, un, key, 7.5)
    assert images.dtype == np.uint8

    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               height=H, width=W, decode_tile=4)
    img_tiled, _ = aot.load_pipeline(blob)(tiny_models, toks, un, key, 7.5)
    assert img_tiled.shape == (1, H, W, 3)


def test_export_validates_size(tiny_cfg, tiny_models):
    with pytest.raises(ValueError, match="multiples"):
        aot.export_pipeline(tiny_cfg, tiny_models, height=17, width=16)
    with pytest.raises(ValueError, match="sampler"):
        aot.export_pipeline(tiny_cfg, tiny_models, height=16, width=16,
                            sampler="nope")


def test_export_sdxl_roundtrip(tiny_tokenizer):
    """The serving artifact covers the SDXL family too (dual towers +
    add_cond all live inside the one compiled program)."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(23)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    blob = aot.export_pipeline(cfg, models, n_steps=N_STEPS, batch=1,
                               height=H, width=W, sampler="euler")
    loaded = aot.load_pipeline(blob)
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(7), 7.5)
    assert images.shape == (1, H, W, 3) and images.dtype == np.uint8

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=7, n_inference_steps=N_STEPS, config=cfg,
                        height=H, width=W, sampler_name="euler")
    np.testing.assert_array_equal(images[0], live)


def test_export_inpaint_blend_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """Round 3: inpaint (latent-blend) exports; mask rides in the aux dict
    and the artifact bit-matches the live pipeline."""
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               height=H, width=W, img2img=True,
                               inpaint="blend")
    loaded = aot.load_pipeline(blob)
    assert "mask" in loaded.aux_keys

    rng = np.random.RandomState(3)
    img_u8 = rng.randint(0, 256, size=(H, W, 3)).astype(np.uint8)
    mask = np.zeros((H, W), np.float32)
    mask[:, W // 2:] = 1.0

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.sampling import ddpm as ddpm_mod

    live = sdt.generate("a cat", "", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, input_image=img_u8,
                        mask_image=mask, strength=1.0)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    image_f = (img_u8.astype(np.float32) / 255.0) * 2.0 - 1.0
    start = ddpm_mod.start_step_for_strength(N_STEPS, 1.0)
    images, _ = loaded(tiny_models, toks, un, jax.random.PRNGKey(5), 7.5,
                       start_step=start, input_image=image_f[None],
                       mask=mask[None, :, :, None])
    np.testing.assert_array_equal(images[0], live)


def test_export_controlnet_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """Round 3: ControlNet exports; hint + traced scale ride in the aux
    dict and the artifact bit-matches the live pipeline."""
    from pytorch_stable_diffusion_tpu.models import controlnet

    ctrl = controlnet.init(jax.random.PRNGKey(5), tiny_cfg.unet,
                           downsample_factor=tiny_cfg.vae.downsample_factor)
    ctrl["mid_out"] = {"kernel": jnp.full_like(ctrl["mid_out"]["kernel"], 0.05),
                       "bias": jnp.full_like(ctrl["mid_out"]["bias"], 0.01)}
    models = dict(tiny_models, controlnet=ctrl)

    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS,
                               height=H, width=W, use_control=True)
    loaded = aot.load_pipeline(blob)
    assert {"control_hint", "control_scale"} <= set(loaded.aux_keys)

    rng = np.random.RandomState(7)
    hint_u8 = rng.randint(0, 256, size=(H, W, 3)).astype(np.float32)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, control_image=hint_u8,
                        controlnet_scale=0.7)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5,
                       control_hint=(hint_u8 / 255.0)[None],
                       control_scale=0.7)
    np.testing.assert_array_equal(images[0], live)

    with pytest.raises(ValueError, match="control_hint"):
        loaded(models, toks, un, jax.random.PRNGKey(5), 7.5)


def test_export_multi_controlnet_roundtrip(tiny_cfg, tiny_models,
                                           tiny_tokenizer):
    """Multi-ControlNet export: stacked (N, B, H, W, 3) hints and an (N,)
    scale vector ride the aux dict; artifact bit-matches live."""
    from pytorch_stable_diffusion_tpu.models import controlnet

    def nontrivial(seed):
        p = controlnet.init(jax.random.PRNGKey(seed), tiny_cfg.unet,
                            downsample_factor=tiny_cfg.vae.downsample_factor)
        p["mid_out"] = {
            "kernel": jnp.full_like(p["mid_out"]["kernel"], 0.05),
            "bias": jnp.full_like(p["mid_out"]["bias"], 0.01)}
        return p

    models = dict(tiny_models, controlnet=[nontrivial(5), nontrivial(6)])
    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS,
                               height=H, width=W, use_control=True)
    loaded = aot.load_pipeline(blob)

    rng = np.random.RandomState(8)
    hints = rng.randint(0, 256, size=(2, H, W, 3)).astype(np.float32)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W,
                        control_image=[hints[0], hints[1]],
                        controlnet_scale=[0.7, 0.3])

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5,
                       control_hint=(hints / 255.0)[:, None],
                       control_scale=[0.7, 0.3])
    np.testing.assert_array_equal(images[0], live)


def test_export_emphasis_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """Emphasis export: per-token weight rows ride the aux dict; the
    artifact bit-matches the live emphasis pipeline, and omitting the
    weights defaults to an exact no-op."""
    import pytorch_stable_diffusion_tpu as sdt

    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               height=H, width=W, emphasis=True)
    loaded = aot.load_pipeline(blob)
    assert {"cond_weights", "uncond_weights"} <= set(loaded.aux_keys)

    live = sdt.generate("a (cat:1.8)", "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, emphasis=True)
    ct, cw = tiny_tokenizer.encode_weighted("a (cat:1.8)")
    ut, uw = tiny_tokenizer.encode_weighted("a dog")
    images, _ = loaded(tiny_models, np.asarray([ct], np.int32),
                       np.asarray([ut], np.int32), jax.random.PRNGKey(5),
                       7.5, cond_weights=[cw], uncond_weights=[uw])
    np.testing.assert_array_equal(images[0], live)

    plain = sdt.generate("a cat", "a dog", models=tiny_models,
                         tokenizer=tiny_tokenizer, seed=5,
                         n_inference_steps=N_STEPS, config=tiny_cfg,
                         height=H, width=W)
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("a dog")], np.int32)
    images2, _ = loaded(tiny_models, toks, un, jax.random.PRNGKey(5), 7.5)
    np.testing.assert_array_equal(images2[0], plain)


def test_export_latent_img2img_roundtrip(tiny_cfg, tiny_models,
                                         tiny_tokenizer):
    """img2img='latent' artifact (hires-fix second pass / refiner latent
    handoff): the image argument carries ready latents; bit-matches the
    live init_latents path."""
    import pytorch_stable_diffusion_tpu as sdt

    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               height=H, width=W, img2img="latent")
    loaded = aot.load_pipeline(blob)
    f = tiny_cfg.vae.downsample_factor
    lat_shape = (1, H // f, W // f, tiny_cfg.vae.latent_channels)
    assert loaded.image_shape == lat_shape

    rng = np.random.RandomState(9)
    lat = rng.randn(*lat_shape).astype(np.float32)
    from pytorch_stable_diffusion_tpu.sampling import ddpm

    live = sdt.generate("a cat", "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, init_latents=lat, strength=0.7)
    start = ddpm.start_step_for_strength(N_STEPS, 0.7)
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("a dog")], np.int32)
    images, _ = loaded(tiny_models, toks, un, jax.random.PRNGKey(5), 7.5,
                       start_step=start, input_image=lat)
    np.testing.assert_array_equal(images[0], live)

    with pytest.raises(ValueError, match="pixel"):
        aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                            height=H, width=W, img2img="latent",
                            inpaint="unet9")


def test_export_guidance_variation_roundtrip(tiny_cfg, tiny_models,
                                             tiny_tokenizer):
    """Round-3-late surface: PAG + SAG + variation seeds export; runtime
    scales/seed are aux inputs, bit-matching the live pipeline."""
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W, pag=True,
                               sag=True, variation=True)
    loaded = aot.load_pipeline(blob)
    assert {"pag_scale", "sag_scale", "variation_key",
            "variation_strength"} <= set(loaded.aux_keys)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    key = jax.random.PRNGKey(5)
    images, _ = loaded(tiny_models, toks, un, key, 7.5, pag_scale=2.0,
                       sag_scale=0.5, variation_seed=9,
                       variation_strength=0.4)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, pag_scale=2.0, sag_scale=0.5,
                        variation_seed=9, variation_strength=0.4)
    np.testing.assert_array_equal(images[0], live)


def test_export_hypernetwork_roundtrip(tiny_cfg, tiny_models,
                                       tiny_tokenizer):
    rs = np.random.RandomState(0)
    d = tiny_cfg.unet.d_context
    tree = {str(d): {lane: [{"kernel": rs.randn(d, d).astype(np.float32) * 0.05,
                             "bias": np.zeros(d, np.float32)}]
                     for lane in ("k", "v")}}
    meta = ("linear", False)
    models = dict(tiny_models, hypernetwork=tree)
    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS, batch=1,
                               height=H, width=W, hypernetwork=meta)
    loaded = aot.load_pipeline(blob)
    assert "hyper_strength" in loaded.aux_keys

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5,
                       hypernetwork_strength=0.7)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, hypernetwork=meta,
                        hypernetwork_strength=0.7)
    np.testing.assert_array_equal(images[0], live)


def test_export_spacing_rescale_variant(tiny_cfg, tiny_models,
                                        tiny_tokenizer):
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W, sampler="dpm++",
                               timestep_spacing="karras",
                               guidance_rescale=0.7)
    loaded = aot.load_pipeline(blob)
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(tiny_models, toks, un, jax.random.PRNGKey(5), 7.5)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=tiny_models,
                        tokenizer=tiny_tokenizer, seed=5,
                        n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, sampler_name="dpm++",
                        timestep_spacing="karras", guidance_rescale=0.7)
    np.testing.assert_array_equal(images[0], live)


def test_export_t2i_adapter_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """T2I-Adapter exports: stacked hint + traced scale ride the aux dict
    and the artifact bit-matches the live pipeline."""
    from pytorch_stable_diffusion_tpu.models import t2i_adapter

    ad = t2i_adapter.init(jax.random.PRNGKey(7), tiny_cfg.unet,
                          downsample_factor=tiny_cfg.vae.downsample_factor)
    models = dict(tiny_models, t2i_adapter=ad)

    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS,
                               height=H, width=W, use_adapter=True)
    loaded = aot.load_pipeline(blob)
    assert {"adapter_hint", "adapter_scale"} <= set(loaded.aux_keys)

    rng = np.random.RandomState(9)
    hint_u8 = rng.randint(0, 256, size=(H, W, 3)).astype(np.float32)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, adapter_image=hint_u8,
                        adapter_scale=0.7)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5,
                       adapter_hint=(hint_u8 / 255.0)[None],
                       adapter_scale=0.7)
    np.testing.assert_array_equal(images[0], live)


def test_export_ip_adapter_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    """IP-Adapter exports: the CLIP-preprocessed image prompt + traced
    scale ride the aux dict and the artifact bit-matches the live
    pipeline."""
    from pytorch_stable_diffusion_tpu.models import clip_vision as cv
    from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
    from tests.test_ip_adapter import _synthetic_ip_state

    vis_cfg = cv.tiny_vision_config()
    vision = cv.init(jax.random.PRNGKey(21), vis_cfg)
    adapter = ipw.convert_ip_adapter(
        _synthetic_ip_state(tiny_cfg.unet, embed_dim=vis_cfg.proj_dim,
                            seed=13), tiny_cfg.unet)
    models = dict(tiny_models, ip_adapter=adapter, clip_vision=vision)

    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS,
                               height=H, width=W, ip_adapter=True,
                               ip_vision=vis_cfg)
    loaded = aot.load_pipeline(blob)
    assert {"ip_image", "ip_scale"} <= set(loaded.aux_keys)

    rng = np.random.RandomState(11)
    img_u8 = rng.randint(0, 256, size=(vis_cfg.image_size,
                                       vis_cfg.image_size, 3)) \
        .astype(np.uint8)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W, ip_adapter_image=img_u8,
                        ip_adapter_scale=0.8, clip_vision_config=vis_cfg)

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5,
                       ip_image=cv.preprocess(img_u8, vis_cfg),
                       ip_scale=0.8)
    np.testing.assert_array_equal(images[0], live)

    with pytest.raises(ValueError, match="ip_image"):
        loaded(models, toks, un, jax.random.PRNGKey(5), 7.5)


def test_export_animatediff_roundtrip(tiny_cfg, tiny_models,
                                      tiny_tokenizer):
    """AnimateDiff exports: batch == frame axis, motion modules ride in
    models; the artifact bit-matches the live animate path."""
    torch = pytest.importorskip("torch")
    from pytorch_stable_diffusion_tpu.weights import animatediff as ad
    from tests.test_animatediff import _synthetic_motion_state

    tree, _ = ad.convert_motion_module(
        _synthetic_motion_state(tiny_cfg.unet, torch, seed=9),
        tiny_cfg.unet)
    models = dict(tiny_models, motion=tree)
    F = 3
    blob = aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS,
                               batch=F, height=H, width=W, n_frames=F)
    loaded = aot.load_pipeline(blob)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate_images(["a cat"] * 1, models=models,
                               tokenizer=tiny_tokenizer, seed=5,
                               n_inference_steps=N_STEPS, config=tiny_cfg,
                               height=H, width=W, n_frames=F)
    toks = np.asarray([tiny_tokenizer.encode("a cat")] * F, np.int32)
    un = np.asarray([tiny_tokenizer.encode("")] * F, np.int32)
    images, _ = loaded(models, toks, un, jax.random.PRNGKey(5), 7.5)
    np.testing.assert_array_equal(images, live)

    with pytest.raises(ValueError, match="batch == n_frames"):
        aot.export_pipeline(tiny_cfg, models, n_steps=N_STEPS, batch=1,
                            height=H, width=W, n_frames=F)


def test_export_sdxl_micro_conditioning(tiny_tokenizer):
    """Round 4: the SDXL micro-conditioning ids (diffusers original_size /
    crops_coords_top_left / target_size, SDXL report §2.2) are static
    per-artifact choices; an artifact exported with them bit-matches the
    live pipeline called with the same knobs, and non-add_embed families
    reject them like the live pipeline does."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(29)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    blob = aot.export_pipeline(cfg, models, n_steps=N_STEPS, height=H,
                               width=W, sampler="euler",
                               original_size=(64, 64), crop_coords=(2, 2))
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    images, _ = aot.load_pipeline(blob)(models, toks, un,
                                        jax.random.PRNGKey(7), 7.5)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models, tokenizer=tiny_tokenizer,
                        seed=7, n_inference_steps=N_STEPS, config=cfg,
                        height=H, width=W, sampler_name="euler",
                        original_size=(64, 64), crop_coords=(2, 2))
    np.testing.assert_array_equal(images[0], live)
    # the knobs must actually condition the artifact
    base = aot.export_pipeline(cfg, models, n_steps=N_STEPS, height=H,
                               width=W, sampler="euler")
    plain, _ = aot.load_pipeline(base)(models, toks, un,
                                       jax.random.PRNGKey(7), 7.5)
    assert (plain != images).any()


def test_export_micro_conditioning_rejected_off_family(tiny_cfg, tiny_models):
    with pytest.raises(ValueError, match="micro-conditioning"):
        aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS, height=H,
                            width=W, original_size=(64, 64))


def test_export_refiner_ensemble_handoff(tiny_tokenizer):
    """Round 4 (VERDICT #7): the SDXL base->refiner ensemble as two serving
    artifacts — a base txt2img artifact whose returned latents feed a
    refiner ``img2img="latent"`` artifact (no decode/re-encode between the
    experts, the diffusers ensemble-of-experts flow).  Both legs bit-match
    the live pipeline; target_size is rejected for the 5-id family."""
    from tests.test_sdxl_refiner import tiny_refiner_config

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod
    from pytorch_stable_diffusion_tpu.sampling import ddpm

    cfg = tiny_refiner_config()
    key = jax.random.PRNGKey(13)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)

    # base leg: any txt2img artifact's latents (here the refiner family
    # itself in txt2img mode, to keep the test to one model set)
    base_blob = aot.export_pipeline(cfg, models, n_steps=N_STEPS, height=H,
                                    width=W, sampler="euler")
    _, base_lat = aot.load_pipeline(base_blob)(models, toks, un,
                                               jax.random.PRNGKey(9), 7.5)

    strength = 0.5
    start = ddpm.start_step_for_strength(N_STEPS, strength)
    ref_blob = aot.export_pipeline(cfg, models, n_steps=N_STEPS, height=H,
                                   width=W, sampler="euler",
                                   img2img="latent")
    images, _ = aot.load_pipeline(ref_blob)(
        models, toks, un, jax.random.PRNGKey(9), 7.5, start_step=start,
        input_image=base_lat)

    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=models,
                        tokenizer=tiny_tokenizer, seed=9,
                        n_inference_steps=N_STEPS, config=cfg, height=H,
                        width=W, sampler_name="euler",
                        init_latents=base_lat, strength=strength)
    np.testing.assert_array_equal(images[0], live)

    with pytest.raises(ValueError, match="target_size"):
        aot.export_pipeline(cfg, models, n_steps=N_STEPS, height=H, width=W,
                            target_size=(64, 64))


def test_prime_pipeline_writes_stable_cache_entry(tiny_cfg, tiny_models,
                                                  tmp_path):
    """Serving-deployment contract (round 5): prime_pipeline compiles the
    artifact once and the persistent cache gains a ``call_exported``
    entry; a SECOND prime of the same artifact adds no new entries (the
    key is stable — this is what makes artifact+cache a single shipped
    deployment).  The live jit's ``jit_run`` entries are keyed
    differently, which is the round-4 divergence this closes."""
    import os

    from jax._src import compilation_cache as cc

    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W)
    cache_dir = str(tmp_path / "xla_cache")
    os.makedirs(cache_dir)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    cc.reset_cache()  # the cache object pins its dir at first use
    try:
        loaded = aot.prime_pipeline(blob, tiny_models)
        entries = sorted(os.listdir(cache_dir))
        assert any("call_exported" in e for e in entries), entries
        aot.prime_pipeline(blob, tiny_models)
        assert sorted(os.listdir(cache_dir)) == entries
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_secs)
        cc.reset_cache()
    # the primed pipeline is ready to serve
    toks = np.zeros(loaded.token_shape, np.int32)
    images, _ = loaded(tiny_models, toks, toks, jax.random.PRNGKey(1), 7.5)
    assert images.shape == (1, H, W, 3)
