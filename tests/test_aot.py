"""AOT export/deserialize of the compiled generation program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.utils import aot

N_STEPS = 2
H = W = 16


def test_export_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer):
    blob = aot.export_pipeline(tiny_cfg, tiny_models, n_steps=N_STEPS,
                               batch=1, height=H, width=W)
    assert isinstance(blob, bytes) and len(blob) > 1000

    loaded = aot.load_pipeline(blob)
    assert "cpu" in loaded.platforms

    toks = np.asarray([tiny_tokenizer.encode("a cat")], np.int32)
    un = np.asarray([tiny_tokenizer.encode("")], np.int32)
    key = jax.random.PRNGKey(5)
    images, latents = loaded(tiny_models, toks, un, key, 7.5)
    assert images.shape == (1, H, W, 3) and images.dtype == np.uint8

    # must equal the live pipeline bit-for-bit (same program, same inputs)
    import pytorch_stable_diffusion_tpu as sdt

    live = sdt.generate("a cat", "", models=tiny_models, tokenizer=tiny_tokenizer,
                        seed=5, n_inference_steps=N_STEPS, config=tiny_cfg,
                        height=H, width=W)
    np.testing.assert_array_equal(images[0], live)


def test_export_validates_size(tiny_cfg, tiny_models):
    with pytest.raises(ValueError, match="multiples"):
        aot.export_pipeline(tiny_cfg, tiny_models, height=17, width=16)
