"""A1111 built-in "scripts" as API helpers: prompt matrix and X/Y grid.

Host-side choreography over the serving path; no reference analog.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

H = W = 16
N_STEPS = 2


@pytest.fixture(scope="module")
def sd(tiny_models, tiny_tokenizer, tiny_cfg):
    return sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)


def test_prompt_matrix_grid(sd):
    kw = dict(n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    grid = sd.prompt_matrix("a cat|a dog", **kw)
    # 1 option -> 2 images -> 1 row x 2 cols
    assert grid.shape == (H, 2 * W, 3) and grid.dtype == np.uint8
    # subset 0 is the bare base prompt: equals a plain generate
    base = sd.txt2img("a cat", **kw)
    np.testing.assert_array_equal(grid[:, :W], base)
    # the with-option cell differs
    assert (grid[:, W:] != base).any()
    grid2 = sd.prompt_matrix("a|cat|dog", **kw)  # 2 options -> 2x2
    assert grid2.shape == (2 * H, 2 * W, 3)
    with pytest.raises(ValueError, match="options"):
        sd.prompt_matrix("no options here", **kw)


def test_xyz_grid(sd):
    kw = dict(n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    grid = sd.xyz_grid("a cat", x=("cfg_scale", [5.0, 9.0]),
                       y=("sampler_name", ["euler", "ddim"]), **kw)
    assert grid.shape == (2 * H, 2 * W, 3)
    # the top-left cell reproduces the plain call with those settings
    cell = sd.txt2img("a cat", cfg_scale=5.0, sampler_name="euler", **kw)
    np.testing.assert_array_equal(grid[:H, :W], cell)
    # sweeping a traced knob changes the image
    assert (grid[:H, :W] != grid[:H, W:]).any()
    with pytest.raises(ValueError, match="at least one"):
        sd.xyz_grid("a cat", **kw)
