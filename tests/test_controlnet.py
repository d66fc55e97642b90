"""ControlNet: side-network conditioning (models/controlnet.py).

The reference has no ControlNet; these tests pin the published architecture
properties: a fresh ControlNet (zero convs zeroed) is an exact no-op on the
pipeline, conditioning-scale 0 is a no-op, a non-trivial ControlNet changes
the output, and the CompVis ``control_model.*`` converter round-trips.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import controlnet
from pytorch_stable_diffusion_tpu.weights import convert

N_STEPS = 2
H = W = 16


@pytest.fixture(scope="module")
def ctrl_params(tiny_cfg):
    return controlnet.init(jax.random.PRNGKey(5), tiny_cfg.unet,
                           downsample_factor=tiny_cfg.vae.downsample_factor)


@pytest.fixture(scope="module")
def hint_image():
    rng = np.random.RandomState(11)
    return rng.randint(0, 256, (H, W, 3)).astype(np.float32)


def _gen(models, tok, cfg, **kw):
    kw.setdefault("n_inference_steps", N_STEPS)
    kw.setdefault("height", H)
    kw.setdefault("width", W)
    kw.setdefault("seed", 0)
    return sdt.generate("a photo of a cat", "a dog", models=models,
                        tokenizer=tok, config=cfg, return_latents=True, **kw)


def test_hint_plan_matches_published_layout():
    from pytorch_stable_diffusion_tpu.models.config import UNetConfig

    plan = controlnet.hint_plan(UNetConfig(), 8)
    assert plan == [(3, 16, 1), (16, 16, 1), (16, 32, 2), (32, 32, 1),
                    (32, 96, 2), (96, 96, 1), (96, 256, 2), (256, 320, 1)]


def test_encode_hint_lands_on_latent_grid(tiny_cfg, ctrl_params):
    hint = jnp.zeros((1, H, W, 3), jnp.float32)
    out = controlnet.encode_hint(ctrl_params, hint, tiny_cfg.unet,
                                 tiny_cfg.vae.downsample_factor)
    assert out.shape == (1, H // tiny_cfg.vae.downsample_factor,
                         W // tiny_cfg.vae.downsample_factor,
                         tiny_cfg.unet.model_channels)


def test_fresh_controlnet_is_noop(tiny_cfg, tiny_models, tiny_tokenizer,
                                  ctrl_params, hint_image):
    _, base_lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    models = dict(tiny_models, controlnet=ctrl_params)
    _, ctrl_lat = _gen(models, tiny_tokenizer, tiny_cfg,
                       control_image=hint_image)
    # zero-init projections -> residuals are exactly zero
    np.testing.assert_allclose(np.asarray(ctrl_lat), np.asarray(base_lat),
                               rtol=0, atol=1e-5)


def _nontrivial(ctrl_params):
    p = jax.tree_util.tree_map(lambda x: x, ctrl_params)  # shallow copy tree
    p["zero_convs"] = [
        {"kernel": jnp.full_like(z["kernel"], 0.05),
         "bias": jnp.full_like(z["bias"], 0.01)}
        for z in ctrl_params["zero_convs"]]
    p["mid_out"] = {"kernel": jnp.full_like(ctrl_params["mid_out"]["kernel"], 0.05),
                    "bias": jnp.full_like(ctrl_params["mid_out"]["bias"], 0.01)}
    # the final hint conv is zero-init too (fresh net ignores the hint) —
    # fill it so hint content reaches the residuals
    hb = list(ctrl_params["hint_block"])
    hb[-1] = {"kernel": jnp.full_like(hb[-1]["kernel"], 0.05),
              "bias": jnp.full_like(hb[-1]["bias"], 0.0)}
    p["hint_block"] = hb
    return p


def test_controlnet_changes_output_and_scale_gates_it(
        tiny_cfg, tiny_models, tiny_tokenizer, ctrl_params, hint_image):
    _, base_lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    models = dict(tiny_models, controlnet=_nontrivial(ctrl_params))
    _, lat1 = _gen(models, tiny_tokenizer, tiny_cfg, control_image=hint_image)
    assert np.abs(np.asarray(lat1) - np.asarray(base_lat)).max() > 1e-3

    # traced conditioning scale: 0.0 restores the baseline without recompile
    _, lat0 = _gen(models, tiny_tokenizer, tiny_cfg, control_image=hint_image,
                   controlnet_scale=0.0)
    np.testing.assert_allclose(np.asarray(lat0), np.asarray(base_lat),
                               rtol=0, atol=1e-5)

    # hint content matters
    _, lat2 = _gen(models, tiny_tokenizer, tiny_cfg,
                   control_image=np.zeros((H, W, 3), np.float32))
    assert np.abs(np.asarray(lat1) - np.asarray(lat2)).max() > 1e-5


def test_controlnet_with_img2img(tiny_cfg, tiny_models, tiny_tokenizer,
                                 ctrl_params, hint_image):
    models = dict(tiny_models, controlnet=_nontrivial(ctrl_params))
    rng = np.random.RandomState(3)
    init = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    img, _ = _gen(models, tiny_tokenizer, tiny_cfg, control_image=hint_image,
                  input_image=init, strength=0.9)
    assert img.shape == (H, W, 3)


def test_control_image_without_params_raises(tiny_cfg, tiny_models,
                                             tiny_tokenizer, hint_image):
    with pytest.raises(ValueError, match="controlnet"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg, control_image=hint_image)


def test_controlnet_converter_roundtrip(tiny_cfg, ctrl_params):
    sd = convert.deconvert_controlnet(ctrl_params, tiny_cfg)
    assert all(k.startswith("control_model.") for k in sd)
    assert "control_model.input_hint_block.0.weight" in sd
    assert "control_model.zero_convs.0.0.weight" in sd
    assert "control_model.middle_block_out.0.weight" in sd
    back = convert.convert_controlnet(sd, tiny_cfg)
    flat_a = jax.tree_util.tree_leaves(ctrl_params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_controlnet_coverage_errors(tiny_cfg, ctrl_params):
    sd = convert.deconvert_controlnet(ctrl_params, tiny_cfg)
    missing = dict(sd)
    missing.pop("control_model.middle_block_out.0.weight")
    with pytest.raises(KeyError, match="missing source key"):
        convert.convert_controlnet(missing, tiny_cfg)
    extra = dict(sd)
    extra["control_model.bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        convert.convert_controlnet(extra, tiny_cfg)
    # non-control keys (merged checkpoint) are tolerated
    merged = dict(sd)
    merged["model.diffusion_model.whatever"] = np.zeros((1,), np.float32)
    convert.convert_controlnet(merged, tiny_cfg)


def test_api_with_controlnet(tiny_cfg, tiny_models, tiny_tokenizer,
                             ctrl_params, hint_image):
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    sd2 = sd.with_controlnet(_nontrivial(ctrl_params))
    img = sd2.txt2img("a cat", control_image=hint_image,
                      n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    assert img.shape == (H, W, 3)
    assert "controlnet" not in sd.models  # original bundle untouched


def test_controlnet_sdxl_topology_roundtrip():
    """Config-driven rules adapt to SDXL (stacked transformer depth,
    label_emb added-conditioning MLP) — structural round-trip."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    cfg = tiny_sdxl_config()
    p = controlnet.init(jax.random.PRNGKey(1), cfg.unet,
                        downsample_factor=cfg.vae.downsample_factor)
    assert "add_embed" in p
    sd = convert.deconvert_controlnet(p, cfg)
    assert "control_model.label_emb.0.0.weight" in sd
    back = convert.convert_controlnet(sd, cfg)
    a = jax.tree_util.tree_leaves(p)
    b = jax.tree_util.tree_leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_controlnet_diffusers_layout_roundtrip(tiny_cfg, ctrl_params, tmp_path):
    """Diffusers ControlNetModel layout: round-trip AND cross-layout
    equivalence with the CompVis path, plus directory loading."""
    from safetensors.numpy import save_file

    from pytorch_stable_diffusion_tpu.weights import diffusers as dif

    sd = dif.deconvert_controlnet_diffusers(ctrl_params, tiny_cfg)
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    assert "controlnet_mid_block.weight" in sd
    back = dif.convert_controlnet_diffusers(sd, tiny_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(ctrl_params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cross-layout: CompVis deconvert -> convert == diffusers round-trip
    cv = convert.convert_controlnet(
        convert.deconvert_controlnet(ctrl_params, tiny_cfg), tiny_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(cv),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # directory loader + api dispatch
    d = tmp_path / "cn"
    d.mkdir()
    # deconvert returns transpose VIEWS; safetensors serializes the raw
    # buffer, so contiguity is the saver's job (weights/save.py does the
    # same for its own exports)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(d / "diffusion_pytorch_model.safetensors"))
    loaded = dif.load_diffusers_controlnet(str(d), tiny_cfg)
    for a, b in zip(jax.tree_util.tree_leaves(ctrl_params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_multi_controlnet_additivity(tiny_cfg, tiny_models, tiny_tokenizer,
                                     ctrl_params, hint_image):
    """Two side nets: a fresh (zero) net adds nothing, so [nontrivial,
    fresh] == [nontrivial]; per-net scales are respected."""
    nt = _nontrivial(ctrl_params)
    single = dict(tiny_models, controlnet=nt)
    _, lat_single = _gen(single, tiny_tokenizer, tiny_cfg,
                         control_image=hint_image)

    both = dict(tiny_models, controlnet=[nt, ctrl_params])
    zero_hint = np.zeros((H, W, 3), np.float32)
    _, lat_both = _gen(both, tiny_tokenizer, tiny_cfg,
                       control_image=[hint_image, zero_hint])
    np.testing.assert_allclose(np.asarray(lat_both), np.asarray(lat_single),
                               rtol=0, atol=1e-5)

    # scale vector: zeroing the nontrivial net restores the baseline
    _, base_lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    _, lat_scaled = _gen(both, tiny_tokenizer, tiny_cfg,
                         control_image=[hint_image, zero_hint],
                         controlnet_scale=[0.0, 1.0])
    np.testing.assert_allclose(np.asarray(lat_scaled), np.asarray(base_lat),
                               rtol=0, atol=1e-5)

    with pytest.raises(ValueError, match="control images"):
        _gen(both, tiny_tokenizer, tiny_cfg, control_image=[hint_image])
    with pytest.raises(ValueError, match="scales"):
        _gen(both, tiny_tokenizer, tiny_cfg,
             control_image=[hint_image, zero_hint],
             controlnet_scale=[1.0, 1.0, 1.0])
