"""Dynamic thresholding (Imagen; diffusers ``thresholding=True`` /
``_threshold_sample``): per-sample |x0| quantile s (floored at 1), x0
clipped to [-s, s] and rescaled by s, mapped back to eps.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

H = W = 16
N_STEPS = 3


def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, return_latents=True, **kw)


def test_threshold_changes_output_and_bounds_x0(tiny_models, tiny_tokenizer,
                                                tiny_cfg):
    img_t, lat_t = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                        dynamic_threshold=0.8)  # aggressive, to bite
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    assert img_t.shape == (H, W, 3)
    assert (img_t != img_b).any()
    assert np.isfinite(np.asarray(lat_t)).all()


def test_threshold_ratio_one_with_huge_s_is_weak(tiny_models,
                                                 tiny_tokenizer, tiny_cfg):
    """ratio 1.0 -> s = max|x0| (>= 1 for random-weight latents), so only
    the /s rescale acts; still a valid program and finite."""
    img, lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg,
                    dynamic_threshold=1.0)
    assert np.isfinite(np.asarray(lat)).all()


def test_threshold_validation(tiny_models, tiny_tokenizer, tiny_cfg):
    with pytest.raises(ValueError, match="quantile"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, dynamic_threshold=1.5)
    with pytest.raises(ValueError, match="quantile"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, dynamic_threshold=0.0)
