"""Composable diffusion (A1111 ``AND`` syntax).

No reference analog; semantics follow A1111's composable-diffusion
implementation: ``eps = eps_uncond + cfg Σ w_i (eps_cond_i − eps_uncond)``
with per-segment trailing ``:weight``.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu import prompt_schedule as ps

H = W = 16
N_STEPS = 2


# ---------------------------------------------------------------- parser
def test_split_composable():
    parts, ws = ps.split_composable("a cat AND a dog:1.2 AND bird:-0.5")
    assert parts == ["a cat", "a dog", "bird"]
    assert ws == [1.0, 1.2, -0.5]


def test_split_composable_keeps_emphasis_colons():
    parts, ws = ps.split_composable("a (cat:1.3) AND (dog:1.1):0.7")
    assert parts == ["a (cat:1.3)", "(dog:1.1):0.7"[:-4] or "(dog:1.1)"]
    assert parts[1] == "(dog:1.1)"
    assert ws == [1.0, 0.7]


def test_split_composable_no_and():
    assert ps.split_composable("plain prompt") == (["plain prompt"], [1.0])
    assert not ps.has_composable("sand AND")  # needs the spaced keyword


# -------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, prompt, **kw):
    return sdt.generate(prompt, "a photo", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, return_latents=True, **kw)


def test_and_duplicate_segments_equal_single(tiny_models, tiny_tokenizer,
                                             tiny_cfg):
    """'p AND p' with weights summing to 1 is mathematically identical to
    plain 'p' (both cond lanes predict the same eps)."""
    _, lat_a = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    "a cat:0.5 AND a cat:0.5")
    _, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, "a cat")
    np.testing.assert_allclose(np.asarray(lat_a), np.asarray(lat_b),
                               atol=1e-4, rtol=0)


def test_and_changes_output(tiny_models, tiny_tokenizer, tiny_cfg):
    img_and, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                      "a cat AND a dog:0.8")
    img_one, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg, "a cat")
    assert img_and.shape == (H, W, 3)
    assert np.mean(np.abs(img_and.astype(np.float32) - img_one)) > 0.5


def test_and_batch_and_img2img(tiny_models, tiny_tokenizer, tiny_cfg):
    imgs = sdt.generate_images(["a cat AND a dog", "dog AND a photo:0.5"],
                               "a", models=tiny_models,
                               tokenizer=tiny_tokenizer, config=tiny_cfg,
                               n_inference_steps=N_STEPS, height=H, width=W,
                               seed=0)
    assert imgs.shape == (2, H, W, 3)
    init = np.zeros((H, W, 3), np.uint8)
    img, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                  "a cat AND a dog", input_image=init, strength=0.8)
    assert img.shape == (H, W, 3)


def test_and_validation(tiny_models, tiny_tokenizer, tiny_cfg):
    with pytest.raises(ValueError, match="do_cfg"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, "a AND b", do_cfg=False)
    with pytest.raises(ValueError, match="same number"):
        sdt.generate_images(["a AND b", "c"], models=tiny_models,
                            tokenizer=tiny_tokenizer, config=tiny_cfg,
                            n_inference_steps=N_STEPS, height=H, width=W)
    with pytest.raises(ValueError, match="PAG"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, "a AND b",
             pag_scale=1.0)
