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


# -------------------------------------------- color correction (pipeline)
def test_match_histograms_exact():
    from pytorch_stable_diffusion_tpu.pipeline import match_histograms

    rs = np.random.RandomState(0)
    src = rs.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    ref = rs.randint(100, 140, size=(32, 32, 3)).astype(np.uint8)
    out = match_histograms(src, ref)
    # matched output's channel distributions land inside the ref's range
    assert out.min() >= 100 and out.max() < 140
    # monotone: pixel ordering preserved per channel
    c = 0
    order_src = np.argsort(src[..., c].ravel(), kind="stable")
    v = out[..., c].ravel()[order_src]
    assert (np.diff(v.astype(int)) >= 0).all()
    # matching to itself is the identity
    np.testing.assert_array_equal(match_histograms(src, src), src)


def test_color_correction_pipeline(tiny_models, tiny_tokenizer, tiny_cfg):
    init = (np.random.RandomState(2).randint(80, 160, size=(H, W, 3))
            .astype(np.uint8))
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              input_image=init, strength=0.9)
    img_cc = sdt.generate("a cat", color_correction=True, **kw)
    img = sdt.generate("a cat", **kw)
    assert (img_cc != img).any()
    d_cc = np.abs(img_cc.astype(np.float64).mean(axis=(0, 1))
                  - init.astype(np.float64).mean(axis=(0, 1))).max()
    d_raw = np.abs(img.astype(np.float64).mean(axis=(0, 1))
                   - init.astype(np.float64).mean(axis=(0, 1))).max()
    assert d_cc < d_raw  # corrected palette tracks the init image
    with pytest.raises(ValueError, match="input_image"):
        sdt.generate("a cat", color_correction=True, models=tiny_models,
                     tokenizer=tiny_tokenizer, config=tiny_cfg,
                     n_inference_steps=N_STEPS, height=H, width=W)


# ------------------------------------------------- initial noise multiplier
def test_noise_multiplier(tiny_models, tiny_tokenizer, tiny_cfg):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    base = sdt.generate("a cat", **kw)
    boosted = sdt.generate("a cat", noise_multiplier=1.1, **kw)
    same = sdt.generate("a cat", noise_multiplier=1.0, **kw)
    assert (boosted != base).any()
    # multiplier 1.0 scales by exactly 1 -> bitwise no-op vs... the graph
    # differs (the multiply exists), so allow rounding-level wiggle
    assert np.abs(same.astype(int) - base.astype(int)).max() <= 1
