"""MultiDiffusion panorama (Bar-Tal et al. 2023; diffusers
StableDiffusionPanoramaPipeline semantics, fused as eps-averaging +
one global sampler step).

Exactness anchor: a canvas that fits ONE window (window == canvas)
must reproduce the plain pipeline bitwise — the sweep has a single
window whose average is the plain eps.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt


def test_single_window_is_exact(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2, seed=3,
              return_latents=True)
    _, base_lat = sdt.generate("a photo of a dog", **kw)
    _, pano_lat = sdt.generate("a photo of a dog", panorama=True,
                               panorama_window=16, **kw)
    np.testing.assert_array_equal(pano_lat, base_lat)


def test_wide_canvas_runs_and_blends(tiny_cfg, tiny_models, tiny_tokenizer):
    # 16x48 canvas, 16-px windows, 8-px stride -> 5 overlapping windows
    img, lat = sdt.generate("a photo of a dog", models=tiny_models,
                            tokenizer=tiny_tokenizer, config=tiny_cfg,
                            height=16, width=48, n_inference_steps=2,
                            seed=3, panorama=True, panorama_window=16,
                            panorama_stride=8, return_latents=True)
    assert img.shape == (16, 48, 3)
    assert np.isfinite(lat).all()
    # deterministic
    img2, lat2 = sdt.generate("a photo of a dog", models=tiny_models,
                              tokenizer=tiny_tokenizer, config=tiny_cfg,
                              height=16, width=48, n_inference_steps=2,
                              seed=3, panorama=True, panorama_window=16,
                              panorama_stride=8, return_latents=True)
    np.testing.assert_array_equal(lat, lat2)


def test_panorama_img2img_and_sampler(tiny_cfg, tiny_models,
                                      tiny_tokenizer):
    init = (np.random.RandomState(0).rand(16, 32, 3) * 255) \
        .astype(np.uint8)
    img = sdt.generate("a photo of a dog", models=tiny_models,
                       tokenizer=tiny_tokenizer, config=tiny_cfg,
                       height=16, width=32, n_inference_steps=3, seed=5,
                       panorama=True, panorama_window=16,
                       panorama_stride=8, input_image=init, strength=0.7,
                       sampler_name="dpm++")
    assert img.shape == (16, 32, 3)


def test_panorama_validation(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=2)
    with pytest.raises(ValueError, match="smaller than"):
        sdt.generate("a dog", panorama=True, panorama_window=32,
                     height=16, width=16, **kw)
    with pytest.raises(ValueError, match="deepcache"):
        sdt.generate("a dog", panorama=True, panorama_window=16,
                     deepcache=2, height=16, width=32, **kw)
    with pytest.raises(ValueError, match="plain"):
        sdt.generate("a dog", panorama=True, panorama_window=16,
                     pag_scale=2.0, height=16, width=32, **kw)
