"""CFG guidance rescale (the "Common Diffusion Noise Schedules" fix)."""

import dataclasses

import numpy as np

import pytorch_stable_diffusion_tpu as sdt

H = W = 16
N_STEPS = 2


def _gen(models, tok, cfg, **kw):
    return sdt.generate("a photo of a cat", "a dog", models=models,
                        tokenizer=tok, config=cfg, n_inference_steps=N_STEPS,
                        height=H, width=W, seed=0, cfg_scale=7.5,
                        return_latents=True, **kw)


def test_rescale_zero_is_identity(tiny_cfg, tiny_models, tiny_tokenizer):
    _, a = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    _, b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, guidance_rescale=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rescale_changes_output(tiny_cfg, tiny_models, tiny_tokenizer):
    _, a = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    _, b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, guidance_rescale=0.7)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_rescale_with_v_prediction(tiny_cfg, tiny_models, tiny_tokenizer):
    cfg = dataclasses.replace(tiny_cfg, prediction_type="v")
    img, _ = _gen(tiny_models, tiny_tokenizer, cfg, guidance_rescale=0.7)
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
