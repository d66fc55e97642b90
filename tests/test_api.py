"""High-level StableDiffusion wrapper."""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt

N_STEPS = 2
H = W = 16


@pytest.fixture(scope="module")
def sd(tiny_cfg, tiny_models, tiny_tokenizer):
    return sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)


def test_txt2img(sd):
    img = sd.txt2img("a cat", seed=1, n_inference_steps=N_STEPS,
                     height=H, width=W)
    assert img.shape == (H, W, 3) and img.dtype == np.uint8


def test_img2img(sd):
    init = (np.random.RandomState(0).rand(H, W, 3) * 255).astype(np.uint8)
    img = sd.img2img("a cat", init, strength=0.5, seed=1,
                     n_inference_steps=N_STEPS, height=H, width=W)
    assert img.shape == (H, W, 3)


def test_batch(sd):
    imgs = sd.generate_batch(["a cat", "a dog"], seed=1,
                             n_inference_steps=N_STEPS, height=H, width=W)
    assert imgs.shape == (2, H, W, 3)


def test_from_checkpoint_roundtrip(tiny_cfg, tiny_models, tiny_tokenizer, tmp_path):
    import json

    from pytorch_stable_diffusion_tpu.weights import save

    ckpt = str(tmp_path / "m.safetensors")
    save.save_safetensors(tiny_models, tiny_cfg, ckpt)
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(tiny_tokenizer.encoder, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in sorted(tiny_tokenizer.bpe_ranks,
                           key=tiny_tokenizer.bpe_ranks.get):
            f.write(f"{a} {b}\n")
    sd2 = sdt.StableDiffusion.from_checkpoint(
        ckpt, str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
        config=tiny_cfg)
    img = sd2.txt2img("a cat", seed=1, n_inference_steps=N_STEPS,
                      height=H, width=W)
    assert img.shape == (H, W, 3)


def test_mesh_wrapper(tiny_cfg, tiny_models, tiny_tokenizer):
    from pytorch_stable_diffusion_tpu.core.mesh import make_mesh

    sd3 = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg,
                              mesh=make_mesh(data=4, model=2))
    imgs = sd3.generate_batch(["a cat"] * 4, seed=2,
                              n_inference_steps=N_STEPS, height=H, width=W)
    assert imgs.shape == (4, H, W, 3)
