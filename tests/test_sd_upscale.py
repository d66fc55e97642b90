"""A1111 "SD upscale" built-in script (api.StableDiffusion.sd_upscale):
lanczos upscale -> overlapping img2img tiles (one compiled shape, batched
through the serving path) -> feathered stitch.

No reference analog; host-side choreography only.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

PROC = 16   # processing tile = the compiled shape
SRC = 16    # source image; x2 -> 32x32 output, 3x3 tiles at overlap 8


@pytest.fixture(scope="module")
def sd(tiny_models, tiny_tokenizer, tiny_cfg):
    return sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)


def test_sd_upscale_shape_and_determinism(sd):
    img = (np.random.RandomState(0).uniform(0, 255, (SRC, SRC, 3))
           .astype(np.uint8))
    kw = dict(scale=2.0, strength=0.4, overlap=8, height=PROC, width=PROC,
              batch_size=4, n_inference_steps=2, seed=7)
    out = sd.sd_upscale("a cat", img, **kw)
    assert out.shape == (2 * SRC, 2 * SRC, 3) and out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float64)).all()
    out2 = sd.sd_upscale("a cat", img, **kw)
    np.testing.assert_array_equal(out, out2)


def test_sd_upscale_stitching_exact_with_identity_model(sd, monkeypatch):
    """With an identity 'model' (tiles returned unchanged) the feathered
    stitch must reconstruct the lanczos upscale exactly: overlapping tiles
    carry identical pixels, and the weights are normalized."""
    import jax

    img = (np.random.RandomState(2).uniform(0, 255, (SRC, SRC, 3))
           .astype(np.uint8))
    ref = np.clip(np.round(np.asarray(jax.image.resize(
        jax.numpy.asarray(img.astype(np.float32)),
        (2 * SRC, 2 * SRC, 3), "lanczos3"))), 0, 255)
    monkeypatch.setattr(
        type(sd), "generate_many",
        lambda self, p, u, **kw: np.asarray(kw["input_image"], np.float32))
    out = sd.sd_upscale("a cat", img, scale=2.0, strength=0.4, overlap=8,
                        height=PROC, width=PROC, n_inference_steps=2,
                        seed=7)
    assert np.abs(out.astype(np.float64) - ref).max() <= 1.0


def test_sd_upscale_validates(sd):
    img = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="img2img directly"):
        sd.sd_upscale("a cat", img, scale=1.5, height=PROC, width=PROC)
    with pytest.raises(ValueError, match="overlap"):
        sd.sd_upscale("a cat", np.zeros((SRC, SRC, 3), np.uint8),
                      scale=4.0, overlap=PROC, height=PROC, width=PROC)


def test_generate_many_per_sample_images(tiny_models, tiny_tokenizer,
                                         tiny_cfg):
    """The serving path accepts one init image PER PROMPT (4-D stack),
    chunked alongside the prompt list."""
    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 256, size=(5, PROC, PROC, 3)).astype(np.uint8)
    out = sdt.generate_many(["a cat"] * 5, batch_size=2, seed=3,
                            models=tiny_models, tokenizer=tiny_tokenizer,
                            config=tiny_cfg, height=PROC, width=PROC,
                            n_inference_steps=2, input_image=imgs,
                            strength=0.5)
    assert out.shape == (5, PROC, PROC, 3)
    # distinct inits -> distinct outputs
    assert (out[0] != out[1]).any()
    with pytest.raises(ValueError, match="input images"):
        sdt.generate_many(["a cat"] * 3, batch_size=2, models=tiny_models,
                          tokenizer=tiny_tokenizer, config=tiny_cfg,
                          height=PROC, width=PROC, n_inference_steps=2,
                          input_image=imgs, strength=0.5)


def test_sd_upscale_rejects_one_small_dimension(sd):
    # 6x16 source at x2 -> 12x32: smaller than the 16-tile in one dim only
    img = np.zeros((6, SRC, 3), np.uint8)
    with pytest.raises(ValueError, match="one dimension"):
        sd.sd_upscale("a cat", img, scale=2.0, height=PROC, width=PROC,
                      n_inference_steps=2)
