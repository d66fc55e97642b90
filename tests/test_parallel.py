"""Data-parallel generation on the 8-virtual-device CPU mesh (SURVEY §4.5;
BASELINE.json config 5)."""

import jax
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core import mesh as mesh_mod
from pytorch_stable_diffusion_tpu.parallel.dp import generate_images_dp, replicate_params

N_STEPS = 2
H = W = 16


def test_virtual_devices_present():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices; got "
        f"{len(jax.devices())}")


def test_make_mesh_shapes():
    m = mesh_mod.make_mesh()
    assert m.shape == {"data": 8, "model": 1}
    m2 = mesh_mod.make_mesh(data=4, model=2)
    assert m2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(data=3, model=2)


def test_local_batch():
    m = mesh_mod.make_mesh()
    assert mesh_mod.local_batch(16, m) == 2
    with pytest.raises(ValueError):
        mesh_mod.local_batch(9, m)


def test_dp_matches_single_device(tiny_cfg, tiny_models, tiny_tokenizer):
    """8-way DP result == single-device result, bit-for-bit up to uint8
    rounding (per-sample PRNG folding makes shard count invisible)."""
    prompts = ["a cat", "a dog", "a photo", "a photo of a dog",
               "cat", "dog", "a", "of a cat"]
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    single = sdt.generate_images(prompts, **kw)

    m = mesh_mod.make_mesh()
    dp = generate_images_dp(prompts, mesh=m, models=tiny_models,
                            tokenizer=tiny_tokenizer, seed=11,
                            n_inference_steps=N_STEPS, config=tiny_cfg,
                            height=H, width=W)
    assert dp.shape == single.shape == (8, H, W, 3)
    assert np.abs(dp.astype(int) - single.astype(int)).max() <= 1


def test_dp_batch_divisibility(tiny_cfg, tiny_models, tiny_tokenizer):
    m = mesh_mod.make_mesh()
    with pytest.raises(ValueError, match="divisible"):
        generate_images_dp(["a", "b", "c"], mesh=m, models=tiny_models,
                           tokenizer=tiny_tokenizer, config=tiny_cfg)


def test_replicate_params(tiny_models):
    m = mesh_mod.make_mesh()
    rep = replicate_params(tiny_models, m)
    leaf = jax.tree_util.tree_leaves(rep)[0]
    assert len(leaf.sharding.device_set) == 8


def test_dp_with_controlnet_matches_single(tiny_cfg, tiny_models,
                                           tiny_tokenizer):
    """Round 3: ControlNet conditioning under 8-way DP (hint sharded with
    the batch, side-net params replicated) == single device."""
    import jax.numpy as jnp

    from pytorch_stable_diffusion_tpu.models import controlnet

    ctrl = controlnet.init(jax.random.PRNGKey(5), tiny_cfg.unet,
                           downsample_factor=tiny_cfg.vae.downsample_factor)
    ctrl["mid_out"] = {
        "kernel": jnp.full_like(ctrl["mid_out"]["kernel"], 0.05),
        "bias": jnp.full_like(ctrl["mid_out"]["bias"], 0.01)}
    models = dict(tiny_models, controlnet=ctrl)
    hint = np.random.RandomState(4).randint(
        0, 256, (H, W, 3)).astype(np.float32)

    prompts = ["a cat", "a dog", "a photo", "a photo of a dog",
               "cat", "dog", "a", "of a cat"]
    kw = dict(models=models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W,
              control_image=hint)
    single = sdt.generate_images(prompts, **kw)
    dp = generate_images_dp(prompts, mesh=mesh_mod.make_mesh(), **kw)
    assert np.abs(dp.astype(int) - single.astype(int)).max() <= 1


def test_dp_guidance_extras_match_single_device(tiny_cfg, tiny_models,
                                                tiny_tokenizer):
    """PAG/SAG/variation graphs partition under DP: the 8-way result
    matches single device up to uint8 rounding (round-3-late features)."""
    prompts = ["a cat", "a dog", "a photo", "a photo of a dog",
               "cat", "dog", "a", "of a cat"]
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W,
              pag_scale=1.5, sag_scale=0.5, variation_seed=3,
              variation_strength=0.4)
    single = sdt.generate_images(prompts, **kw)

    m = mesh_mod.make_mesh()
    dp = generate_images_dp(prompts, mesh=m, models=tiny_models,
                            tokenizer=tiny_tokenizer, seed=11,
                            n_inference_steps=N_STEPS, config=tiny_cfg,
                            height=H, width=W, pag_scale=1.5, sag_scale=0.5,
                            variation_seed=3, variation_strength=0.4)
    assert dp.shape == single.shape == (8, H, W, 3)
    assert np.abs(dp.astype(int) - single.astype(int)).max() <= 1


def test_dp_composable_and_tiling_match_single_device(tiny_cfg, tiny_models,
                                                      tiny_tokenizer):
    """Composable-AND lanes (replicated K*B tokens) and circular-padding
    convs both partition under DP."""
    prompts = ["a cat AND a dog:0.7"] * 8
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=4,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W,
              tiling=True)
    single = sdt.generate_images(prompts, **kw)
    m = mesh_mod.make_mesh()
    dp = generate_images_dp(prompts, mesh=m, models=tiny_models,
                            tokenizer=tiny_tokenizer, seed=4,
                            n_inference_steps=N_STEPS, config=tiny_cfg,
                            height=H, width=W, tiling=True)
    assert np.abs(dp.astype(int) - single.astype(int)).max() <= 1


def test_dp_ip_adapter_and_reference_match_single_device(
        tiny_cfg, tiny_models, tiny_tokenizer):
    """Round-3-late-2 conditioning features partition under DP: the
    IP-Adapter vision/projection graph and the reference-only capture
    pass both run per-shard; 8-way == single device up to uint8
    rounding."""
    from pytorch_stable_diffusion_tpu.models import clip_vision as cv
    from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
    from tests.test_ip_adapter import _synthetic_ip_state

    vis_cfg = cv.tiny_vision_config()
    vision = cv.init(jax.random.PRNGKey(21), vis_cfg)
    adapter = ipw.convert_ip_adapter(
        _synthetic_ip_state(tiny_cfg.unet, embed_dim=vis_cfg.proj_dim,
                            seed=6), tiny_cfg.unet)
    models = dict(tiny_models, ip_adapter=adapter, clip_vision=vision)
    rs = np.random.RandomState(2)
    ip_img = (rs.rand(vis_cfg.image_size, vis_cfg.image_size, 3) * 255) \
        .astype(np.uint8)
    ref_img = (rs.rand(H, W, 3) * 255).astype(np.uint8)
    prompts = ["a cat", "a dog", "a photo", "a photo of a dog",
               "cat", "dog", "a", "of a cat"]
    kw = dict(models=models, tokenizer=tiny_tokenizer, seed=11,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H,
              width=W, ip_adapter_image=ip_img, ip_adapter_scale=0.7,
              clip_vision_config=vis_cfg, reference_image=ref_img,
              reference_fidelity=0.5)
    single = sdt.generate_images(prompts, **kw)
    m = mesh_mod.make_mesh()
    dp = generate_images_dp(prompts, mesh=m, **kw)
    assert dp.shape == single.shape == (8, H, W, 3)
    assert np.abs(dp.astype(int) - single.astype(int)).max() <= 1
