"""Regional prompting (A1111 "Latent Couple" semantics): each AND
sub-prompt steers only inside its spatial mask — the composable-diffusion
combine gains per-lane latent-resolution mask weights.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

KW = dict(height=16, width=16, n_inference_steps=2, seed=3,
          return_latents=True)


def test_full_and_empty_masks_reduce_to_plain_cfg(tiny_cfg, tiny_models,
                                                  tiny_tokenizer):
    """mask0 = all-ones, mask1 = all-zeros: lane 1 contributes exactly
    nothing, so the result equals plain CFG on the first sub-prompt."""
    kw = dict(KW, models=tiny_models, tokenizer=tiny_tokenizer,
              config=tiny_cfg)
    _, plain = sdt.generate("a cat", "a", **kw)
    ones = np.ones((16, 16), np.float32)
    zeros = np.zeros((16, 16), np.float32)
    _, masked = sdt.generate("a cat AND a dog", "a",
                             region_masks=[ones, zeros], **kw)
    # not bitwise: the 3-lane batch re-tiles XLA's fused reductions, so
    # per-sample numerics drift at float-epsilon scale; a real lane-1
    # leak would diverge at O(1) after two CFG-7.5 steps
    np.testing.assert_allclose(masked, plain, rtol=2e-3, atol=2e-3)
    _, uniform = sdt.generate("a cat AND a dog", "a", **kw)
    assert np.abs(uniform - plain).max() > 1e-2  # the dog lane is real


def test_split_masks_differ_from_uniform(tiny_cfg, tiny_models,
                                         tiny_tokenizer):
    kw = dict(KW, models=tiny_models, tokenizer=tiny_tokenizer,
              config=tiny_cfg)
    left = np.zeros((16, 16), np.float32)
    left[:, :8] = 1.0
    right = 1.0 - left
    _, uniform = sdt.generate("a cat AND a dog", "a", **kw)
    _, regional = sdt.generate("a cat AND a dog", "a",
                               region_masks=[left, right], **kw)
    assert np.abs(regional - uniform).max() > 1e-5
    # deterministic
    _, regional2 = sdt.generate("a cat AND a dog", "a",
                                region_masks=[left, right], **kw)
    np.testing.assert_array_equal(regional, regional2)


def test_region_validation(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              height=16, width=16, n_inference_steps=2)
    m = np.ones((16, 16), np.float32)
    with pytest.raises(ValueError, match="AND"):
        sdt.generate("a cat", region_masks=[m], **kw)
    with pytest.raises(ValueError, match="2 AND segments"):
        sdt.generate("a cat AND a dog", region_masks=[m, m, m], **kw)
