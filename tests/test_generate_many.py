"""pipeline.generate_many — pipelined serving path (chunked async dispatch)."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

H = W = 16
STEPS = 2


def test_generate_many_matches_chunked_generate_images(tiny_cfg, tiny_models,
                                                       tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer,
              n_inference_steps=STEPS, config=tiny_cfg, height=H, width=W)
    prompts = ["a cat", "a dog", "a bird", "a fish", "a horse"]  # 5 = 2+2+1pad
    many = sdt.generate_many(prompts, batch_size=2, seed=7, **kw)
    assert many.shape == (5, H, W, 3)
    assert many.dtype == np.uint8

    # chunk i must equal a plain generate_images call with seed 7+i
    for i, chunk in enumerate([prompts[0:2], prompts[2:4]]):
        ref = sdt.generate_images(chunk, seed=7 + i, **kw)
        np.testing.assert_array_equal(many[2 * i:2 * i + 2], ref)
    # padded final chunk: first image kept, pad sliced off
    ref = sdt.generate_images([prompts[4], prompts[4]], seed=9, **kw)
    np.testing.assert_array_equal(many[4], ref[0])


def test_generate_many_distinct_chunks_differ(tiny_cfg, tiny_models,
                                              tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer,
              n_inference_steps=STEPS, config=tiny_cfg, height=H, width=W)
    # same prompt in two chunks -> different noise (seed folds chunk index)
    imgs = sdt.generate_many(["x", "x"], batch_size=1, seed=0, **kw)
    assert (imgs[0] != imgs[1]).any()


def test_generate_many_uncond_length_check(tiny_cfg, tiny_models,
                                           tiny_tokenizer):
    with pytest.raises(ValueError, match="length"):
        sdt.generate_many(["a", "b"], ["u"] * 3, models=tiny_models,
                          tokenizer=tiny_tokenizer, config=tiny_cfg,
                          height=H, width=W, n_inference_steps=STEPS)
