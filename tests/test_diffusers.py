"""Diffusers-format converter: round-trip + cross-format equivalence."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.weights import convert, diffusers


@pytest.fixture(scope="module")
def diff_sds(tiny_cfg, tiny_models):
    return diffusers.deconvert_diffusers(tiny_models, tiny_cfg)


def test_roundtrip_exact(tiny_cfg, tiny_models, diff_sds):
    unet_sd, vae_sd, te_sd = diff_sds
    params = diffusers.convert_diffusers(unet_sd, vae_sd, te_sd, tiny_cfg)
    a, b = flatten(tiny_models), flatten(params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_cross_format_equivalence(tiny_cfg, tiny_models, tiny_state_dict, diff_sds):
    """CompVis path and diffusers path produce identical pytrees."""
    via_compvis = convert.convert(tiny_state_dict, tiny_cfg)
    via_diff = diffusers.convert_diffusers(*diff_sds, tiny_cfg)
    a, b = flatten(via_compvis), flatten(via_diff)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_missing_key_raises(tiny_cfg, diff_sds):
    unet_sd, vae_sd, te_sd = diff_sds
    bad = dict(unet_sd)
    bad.pop("conv_in.weight")
    with pytest.raises(KeyError, match="missing diffusers key"):
        diffusers.convert_diffusers(bad, vae_sd, te_sd, tiny_cfg)


def test_unconsumed_key_raises(tiny_cfg, diff_sds):
    unet_sd, vae_sd, te_sd = diff_sds
    bad = dict(vae_sd)
    bad["decoder.mystery.weight"] = np.zeros(3)
    with pytest.raises(KeyError, match="unconsumed"):
        diffusers.convert_diffusers(unet_sd, bad, te_sd, tiny_cfg)


def test_position_ids_ignored(tiny_cfg, diff_sds):
    unet_sd, vae_sd, te_sd = diff_sds
    te2 = dict(te_sd)
    te2["text_model.embeddings.position_ids"] = np.arange(16)[None]
    diffusers.convert_diffusers(unet_sd, vae_sd, te2, tiny_cfg)  # no raise


def test_load_diffusers_directory(tiny_cfg, tiny_models, diff_sds, tmp_path):
    from safetensors.numpy import save_file

    unet_sd, vae_sd, te_sd = diff_sds
    for sub, sd, fname in (("unet", unet_sd, "diffusion_pytorch_model.safetensors"),
                           ("vae", vae_sd, "diffusion_pytorch_model.safetensors"),
                           ("text_encoder", te_sd, "model.safetensors")):
        d = tmp_path / sub
        d.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  str(d / fname))
    params = diffusers.load_diffusers_pipeline(str(tmp_path), tiny_cfg)
    a, b = flatten(tiny_models), flatten(params)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


# ------------------------------------------------------------------- SDXL
def test_sdxl_diffusers_round_trip(tmp_path):
    """SDXL layout: text_encoder_2 tower (incl. HF text_projection) and
    depth>1 stacked transformer_blocks round-trip exactly, and the
    directory loader picks up the 4th subfolder."""
    from safetensors.numpy import save_file

    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config
    import jax

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(11)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    unet_sd, vae_sd, te_sd, te2_sd = diffusers.deconvert_diffusers(models, cfg)
    assert "text_projection.weight" in te2_sd
    assert any("transformer_blocks.1." in k for k in unet_sd)
    assert any(k.startswith("add_embedding.") for k in unet_sd)

    back = diffusers.convert_diffusers(unet_sd, vae_sd, te_sd, cfg,
                                       text_encoder_2_sd=te2_sd)
    a, b = flatten(models), flatten(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)

    # missing te2 must fail loudly for an SDXL config
    with pytest.raises(ValueError, match="text_encoder_2"):
        diffusers.convert_diffusers(unet_sd, vae_sd, te_sd, cfg)

    for sub, sd, fname in (
            ("unet", unet_sd, "diffusion_pytorch_model.safetensors"),
            ("vae", vae_sd, "diffusion_pytorch_model.safetensors"),
            ("text_encoder", te_sd, "model.safetensors"),
            ("text_encoder_2", te2_sd, "model.safetensors")):
        d = tmp_path / sub
        d.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  str(d / fname))
    loaded = flatten(diffusers.load_diffusers_pipeline(str(tmp_path), cfg))
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(loaded[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


# ---------------------------------------------------------------- refiner
def test_refiner_diffusers_dir_text_encoder_2_only(tmp_path):
    """SDXL-refiner diffusers dirs ship the single bigG tower as
    text_encoder_2/ (NO text_encoder/); the directory loader falls back."""
    from safetensors.numpy import save_file

    from tests.test_sdxl_refiner import tiny_refiner_config
    import jax

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_refiner_config()
    key = jax.random.PRNGKey(13)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    unet_sd, vae_sd, te_sd = diffusers.deconvert_diffusers(models, cfg)
    assert "text_projection.weight" in te_sd  # bigG projection tower
    for sub, sd, fname in (
            ("unet", unet_sd, "diffusion_pytorch_model.safetensors"),
            ("vae", vae_sd, "diffusion_pytorch_model.safetensors"),
            ("text_encoder_2", te_sd, "model.safetensors")):
        d = tmp_path / sub
        d.mkdir()
        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                  str(d / fname))
    params = diffusers.load_diffusers_pipeline(str(tmp_path), cfg)
    a, b = flatten(models), flatten(params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
