"""Non-square generation (height != width) — the reference hard-codes
512x512 (``sd/pipeline.py:7-10``); our generate() takes height/width, so the
rectangular path must actually work: plan-driven UNet stages, spatial
attention over h*w tokens, VAE up/down paths, and img2img resize."""

import numpy as np

import pytorch_stable_diffusion_tpu as sdt

STEPS = 2


def test_txt2img_rectangular(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=5,
              n_inference_steps=STEPS, config=tiny_cfg)
    img = sdt.generate("a cat", height=16, width=32, **kw)
    assert img.shape == (16, 32, 3)
    assert img.dtype == np.uint8
    # deterministic and orientation-sensitive (not a transposed square run)
    img2 = sdt.generate("a cat", height=16, width=32, **kw)
    assert (img == img2).all()
    tall = sdt.generate("a cat", height=32, width=16, **kw)
    assert tall.shape == (32, 16, 3)
    assert (tall != np.transpose(img, (1, 0, 2))).any()


def test_img2img_rectangular(tiny_cfg, tiny_models, tiny_tokenizer):
    rng = np.random.RandomState(0)
    init = rng.randint(0, 255, (16, 32, 3)).astype(np.uint8)
    img = sdt.generate("a cat", input_image=init, strength=0.5,
                       height=16, width=32, models=tiny_models,
                       tokenizer=tiny_tokenizer, seed=5,
                       n_inference_steps=STEPS, config=tiny_cfg)
    assert img.shape == (16, 32, 3)
    assert np.isfinite(img.astype(np.float32)).all()


def test_batched_rectangular(tiny_cfg, tiny_models, tiny_tokenizer):
    imgs = sdt.generate_images(["a cat", "a dog"], models=tiny_models,
                               tokenizer=tiny_tokenizer, seed=1,
                               n_inference_steps=STEPS, config=tiny_cfg,
                               height=24, width=16)
    assert imgs.shape == (2, 24, 16, 3)
    assert (imgs[0] != imgs[1]).any()
