"""Latent-space img2img (init_latents) and the two-pass hires-fix.

TPU-native extension beyond the reference: the second pass consumes the
first pass's latents directly (bilinear latent upscale), skipping the
decode/encode round trip of naive two-pass upscaling."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

H = W = 16
N_STEPS = 3


def test_init_latents_path(tiny_cfg, tiny_models, tiny_tokenizer):
    img, lat = sdt.generate("a cat", "a dog", models=tiny_models,
                            tokenizer=tiny_tokenizer, config=tiny_cfg,
                            n_inference_steps=N_STEPS, height=H, width=W,
                            seed=0, return_latents=True)
    out = sdt.generate("a cat", "a dog", models=tiny_models,
                       tokenizer=tiny_tokenizer, config=tiny_cfg,
                       n_inference_steps=N_STEPS, height=H, width=W,
                       seed=1, init_latents=lat, strength=0.7)
    assert out.shape == (H, W, 3)
    # deterministic
    out2 = sdt.generate("a cat", "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W,
                        seed=1, init_latents=lat, strength=0.7)
    np.testing.assert_array_equal(out, out2)
    # the init latents condition the result
    out3 = sdt.generate("a cat", "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W,
                        seed=1, init_latents=np.zeros_like(lat),
                        strength=0.7)
    assert np.abs(out.astype(np.int32) - out3.astype(np.int32)).max() > 0


def test_init_latents_validation(tiny_cfg, tiny_models, tiny_tokenizer):
    lat = np.zeros((1, H // 2, W // 2, 4), np.float32)
    img = np.zeros((H, W, 3), np.float32)
    with pytest.raises(ValueError, match="not both"):
        sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, n_inference_steps=N_STEPS, height=H,
                     width=W, init_latents=lat, input_image=img)
    with pytest.raises(ValueError, match="shape"):
        sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, n_inference_steps=N_STEPS, height=H,
                     width=W // 2, init_latents=lat)
    mask = np.ones((H, W), np.float32)
    with pytest.raises(ValueError, match="pixel"):
        sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, n_inference_steps=N_STEPS, height=H,
                     width=W,
                     init_latents=np.zeros((1, H // 2, W // 2, 4)),
                     mask_image=mask)


def test_hires_fix(tiny_cfg, tiny_models, tiny_tokenizer):
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    img = sd.hires_fix("a cat", "a dog", height=2 * H, width=2 * W,
                       n_inference_steps=N_STEPS, seed=0, strength=0.6)
    assert img.shape == (2 * H, 2 * W, 3)
    img2 = sd.hires_fix("a cat", "a dog", height=2 * H, width=2 * W,
                        n_inference_steps=N_STEPS, seed=0, strength=0.6)
    np.testing.assert_array_equal(img, img2)
    # differs from single-pass direct generation at the target size
    direct = sd.txt2img("a cat", "a dog", height=2 * H, width=2 * W,
                        n_inference_steps=N_STEPS, seed=0)
    assert np.abs(img.astype(np.int32) - direct.astype(np.int32)).max() > 0


def test_refiner_latent_handoff(tiny_tokenizer):
    """Base->refiner ensemble in latent space: the refiner consumes base
    latents via init_latents (same VAE scale), no decode/encode."""
    import jax

    from pytorch_stable_diffusion_tpu.models import clip, unet, vae
    from test_sdxl_refiner import tiny_refiner_config

    cfg = tiny_refiner_config()
    key = jax.random.PRNGKey(13)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    lat = np.random.RandomState(4).randn(1, H // 2, W // 2, 4) \
        .astype(np.float32)
    out = sdt.generate("a cat", "a dog", models=models,
                       tokenizer=tiny_tokenizer, config=cfg,
                       n_inference_steps=N_STEPS, height=H, width=W,
                       seed=0, init_latents=lat, strength=0.3)
    assert out.shape == (H, W, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_cli_hires_fix(tmp_path):
    import os

    from PIL import Image as PILImage

    from pytorch_stable_diffusion_tpu.__main__ import main
    from test_cli import write_tokenizer_assets
    from pytorch_stable_diffusion_tpu.weights.save import save_safetensors
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config
    import jax

    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    cfg = tiny_sd_config()
    key = jax.random.PRNGKey(42)
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    d = str(tmp_path)
    ckpt = os.path.join(d, "tiny.safetensors")
    save_safetensors(models, cfg, ckpt)
    vocab, merges = write_tokenizer_assets(d, ["a", "cat", "dog"])
    out = os.path.join(d, "hires.png")
    rc = main(["--ckpt", ckpt, "--vocab", vocab, "--merges", merges,
               "--prompt", "a cat", "--steps", "2", "--seed", "3",
               "--width", "32", "--height", "32", "--config-preset", "tiny",
               "--hires-fix", "--strength", "0.6", "--out", out])
    assert rc == 0
    assert np.asarray(PILImage.open(out)).shape == (32, 32, 3)


def test_hires_upscale_methods(tiny_models, tiny_tokenizer, tiny_cfg):
    import pytorch_stable_diffusion_tpu as sdt

    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    kw = dict(height=32, width=32, base_height=16, base_width=16,
              strength=0.6, n_inference_steps=2, seed=0)
    a = sd.hires_fix("a cat", **kw)
    b = sd.hires_fix("a cat", upscale_method="nearest", **kw)
    assert a.shape == b.shape == (32, 32, 3)
    assert (a != b).any()
    import pytest as _pt
    with _pt.raises(ValueError, match="upscale_method"):
        sd.hires_fix("a cat", upscale_method="esrgan", **kw)
