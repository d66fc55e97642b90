"""SD-2.x checkpoint conversion: OpenCLIP text tower (fused in_proj split),
two-way exact coverage, and an end-to-end v-prediction generate from a
converted synthetic checkpoint.

No real SD-2 weights exist on this host (zero egress), so the state dict is
synthetic but CompVis-SHAPED: produced by deconvert (whose OpenCLIP key
schema is asserted explicitly below), saved as a real torch .ckpt, and
ingested through the full load_sd_checkpoint path.
"""

import dataclasses

import jax
import numpy as np
import pytest
import torch

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.models import clip as clip_mod
from pytorch_stable_diffusion_tpu.models.config import (CLIPConfig, SDConfig,
                                                        UNetConfig, VAEConfig,
                                                        sd21_config)
from pytorch_stable_diffusion_tpu.weights import convert
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer


@pytest.fixture(scope="module")
def sd2_cfg():
    """SD-2.1's exact topology at reduced widths: open_clip layout, GELU,
    penultimate conditioning, per-level head_dim, v-prediction."""
    return SDConfig(
        clip=CLIPConfig(vocab_size=1024, d_model=32, max_len=16, n_layers=3,
                        n_heads=4, d_ff=64, hidden_act="gelu",
                        stop_at_layer=2, layout="open_clip"),
        vae=VAEConfig(base_channels=16, ch_mults=(1, 2), groups=4),
        unet=UNetConfig(model_channels=16, ch_mults=(1, 2),
                        attn_levels=(True, False), n_heads=None, head_dim=8,
                        d_context=32, groups=4),
        prediction_type="v",
    )


@pytest.fixture(scope="module")
def sd2_state_dict(sd2_cfg):
    return convert.synthetic_state_dict(sd2_cfg, seed=7)


def test_openclip_key_schema(sd2_cfg, sd2_state_dict):
    """deconvert emits the real SD-2.1 CompVis namespace, fused in_proj
    included — the shapes a genuine checkpoint would have."""
    sd = sd2_state_dict
    d = sd2_cfg.clip.d_model
    assert sd["cond_stage_model.model.token_embedding.weight"].shape == (1024, d)
    assert sd["cond_stage_model.model.positional_embedding"].shape == (16, d)
    for i in range(sd2_cfg.clip.n_layers):
        p = f"cond_stage_model.model.transformer.resblocks.{i}"
        assert sd[f"{p}.attn.in_proj_weight"].shape == (3 * d, d)
        assert sd[f"{p}.attn.in_proj_bias"].shape == (3 * d,)
        assert sd[f"{p}.attn.out_proj.weight"].shape == (d, d)
        assert sd[f"{p}.mlp.c_fc.weight"].shape == (sd2_cfg.clip.d_ff, d)
    assert "cond_stage_model.model.ln_final.weight" in sd
    # no SD-1 namespace leaks
    assert not any(k.startswith("cond_stage_model.transformer.") for k in sd)


def test_roundtrip_exact(sd2_cfg, sd2_state_dict):
    """state dict -> convert -> deconvert == identity (both coverage
    directions enforced inside convert/deconvert)."""
    params = convert.convert(sd2_state_dict, sd2_cfg)
    back = convert.deconvert(params, sd2_cfg)
    assert set(back) == set(sd2_state_dict)
    for k in sd2_state_dict:
        np.testing.assert_array_equal(back[k], np.asarray(sd2_state_dict[k]),
                                      err_msg=k)


def test_inproj_split_semantics(sd2_cfg, sd2_state_dict):
    """The fused (3d, d) in_proj must land as rows [0:d]=q, [d:2d]=k,
    [2d:3d]=v, each transposed to our (in, out) layout — same slicing
    OpenCLIP's own forward uses."""
    params = convert.convert(sd2_state_dict, sd2_cfg)
    d = sd2_cfg.clip.d_model
    w = np.asarray(
        sd2_state_dict["cond_stage_model.model.transformer.resblocks.0.attn.in_proj_weight"])
    b = np.asarray(
        sd2_state_dict["cond_stage_model.model.transformer.resblocks.0.attn.in_proj_bias"])
    attn = params["clip"]["layers"][0]["attn"]
    for j, name in enumerate(("q", "k", "v")):
        np.testing.assert_array_equal(np.asarray(attn[name]["kernel"]),
                                      w[j * d:(j + 1) * d].T)
        np.testing.assert_array_equal(np.asarray(attn[name]["bias"]),
                                      b[j * d:(j + 1) * d])


def test_ckpt_file_ingestion_and_extras_ignored(sd2_cfg, sd2_state_dict, tmp_path):
    """Full file path: torch .ckpt with the SD-2 extras a real checkpoint
    carries (text_projection, logit_scale) -> load_sd_checkpoint."""
    sd = dict(sd2_state_dict)
    d = sd2_cfg.clip.d_model
    sd["cond_stage_model.model.text_projection"] = np.zeros((d, d), np.float32)
    sd["cond_stage_model.model.logit_scale"] = np.float32(4.6052)
    path = str(tmp_path / "sd2_synth.ckpt")
    torch.save({"state_dict": {k: torch.as_tensor(np.asarray(v))
                               for k, v in sd.items()}}, path)
    params = convert.load_sd_checkpoint(path, sd2_cfg)
    assert len(flatten(params["clip"])) == len(flatten(
        clip_mod.init(jax.random.PRNGKey(0), sd2_cfg.clip)))


def test_sd2_generate_end_to_end(sd2_cfg, sd2_state_dict):
    """Converted SD-2-style checkpoint generates (v-prediction, GELU,
    penultimate conditioning, head_dim attention all active)."""
    params = convert.convert(sd2_state_dict, sd2_cfg)
    tok = make_test_tokenizer(["a", "cat"], max_len=sd2_cfg.clip.max_len)
    img = sdt.generate("a cat", models=params, tokenizer=tok, seed=3,
                       n_inference_steps=2, config=sd2_cfg,
                       height=16, width=16)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    assert np.isfinite(img.astype(np.float32)).all()


def test_sd21_fullsize_rules_cover_fullsize_topology():
    """Rule generation at the real sd21_config: right counts, no SD-1 keys."""
    cfg = sd21_config()
    rules = convert.clip_rules(cfg)
    srcs = {r[0] for r in rules}
    assert "cond_stage_model.model.transformer.resblocks.23.ln_2.weight" in srcs
    assert "cond_stage_model.model.positional_embedding" in srcs
    assert not any(s.startswith("cond_stage_model.transformer.") for s in srcs)
    # 24 layers x (in_proj w+b appearing once each as fused sources)
    fused = [r for r in rules if isinstance(r[2], tuple)]
    assert len(fused) == 24 * 6  # 3 q/k/v slices x (weight + bias) per layer
