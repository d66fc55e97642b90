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


def test_attach_places_numpy_leaves_on_device(sd):
    """Adapter loaders emit numpy fp32 trees; if those leaves stay numpy
    inside ``models``, jit re-uploads them host->device on EVERY generate
    call (measured +3.5 s/image for IP-Adapter over the TPU relay).  Every
    with_* builder must place them exactly once, at attach time."""
    import jax

    from pytorch_stable_diffusion_tpu.models import clip_vision as cv
    from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
    from test_ip_adapter import _synthetic_ip_state

    vis_cfg = cv.CLIPVisionConfig(
        image_size=16, patch_size=8, width=16, n_layers=1, n_heads=2,
        d_ff=32, proj_dim=8)
    ipa = ipw.convert_ip_adapter(
        _synthetic_ip_state(sd.config.unet, embed_dim=vis_cfg.proj_dim),
        sd.config.unet)
    vision = cv.init(jax.random.PRNGKey(0), vis_cfg)
    assert any(isinstance(l, np.ndarray) and not isinstance(l, jax.Array)
               for l in jax.tree_util.tree_leaves(ipa)), \
        "precondition: the loader emits host arrays"

    sd_ip = sd.with_ip_adapter(ipa, vision, vision_config=vis_cfg)
    for name in ("ip_adapter", "clip_vision", "diffusion"):
        for leaf in jax.tree_util.tree_leaves(sd_ip.models[name]):
            assert isinstance(leaf, jax.Array), \
                f"host-array leaf left in models[{name!r}]"


def _assert_no_host_leaves(tree, what):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        assert isinstance(leaf, jax.Array), \
            f"host-array leaf left in {what}"


@pytest.mark.parametrize("builder", ["hypernetwork", "motion", "upscaler",
                                     "controlnet"])
def test_every_attach_builder_places_numpy_leaves(sd, builder):
    """Same contract as test_attach_places_numpy_leaves_on_device for the
    remaining with_* builders: attach-time device placement (the leaves'
    VALUES are irrelevant — only jit-argument leaf types are under test)."""
    tree = {"a": np.ones((4, 4), np.float32),
            "b": {"c": np.zeros((2,), np.float32)}}
    if builder == "hypernetwork":
        out = sd.with_hypernetwork((tree, ("relu", False)))
        _assert_no_host_leaves(out.models["hypernetwork"],
                               "models['hypernetwork']")
    elif builder == "motion":
        out = sd.with_motion((tree, 24))
        _assert_no_host_leaves(out.models["motion"], "models['motion']")
    elif builder == "upscaler":
        from pytorch_stable_diffusion_tpu.models.esrgan import ESRGANConfig

        out = sd.with_upscaler((tree, ESRGANConfig(features=8, num_blocks=2,
                                                   growth=4)))
        _assert_no_host_leaves(out._upscaler[0], "_upscaler params")
    else:
        out = sd.with_controlnet(tree)
        _assert_no_host_leaves(out.models["controlnet"],
                               "models['controlnet']")


def test_with_upscaler_rejects_malformed_argument(sd):
    with pytest.raises(ValueError, match="ESRGANConfig"):
        sd.with_upscaler(42)


def test_place_host_arrays_rejects_std_numpy_on_tp_mesh(tiny_models):
    """On a model>1 mesh, a numpy leaf under a std model key means a
    builder bypassed _clone(reshard=True); silent full replication would
    be an HBM footgun — the placement helper must refuse."""
    from pytorch_stable_diffusion_tpu.api import _place_host_arrays
    from pytorch_stable_diffusion_tpu.core.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    bad = dict(tiny_models,
               diffusion={"w": np.ones((4, 4), np.float32)})
    with pytest.raises(RuntimeError, match="reshard"):
        _place_host_arrays(bad, mesh)


def test_mesh_wrapper(tiny_cfg, tiny_models, tiny_tokenizer):
    from pytorch_stable_diffusion_tpu.core.mesh import make_mesh

    sd3 = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg,
                              mesh=make_mesh(data=4, model=2))
    imgs = sd3.generate_batch(["a cat"] * 4, seed=2,
                              n_inference_steps=N_STEPS, height=H, width=W)
    assert imgs.shape == (4, H, W, 3)
