"""Checkpoint converter: exact two-way coverage + layout transforms
(the strict=True analog of ref model_loader.py:30; SURVEY §4.4)."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.weights import convert


def test_roundtrip_exact(tiny_cfg, tiny_models, tiny_state_dict):
    params = convert.convert(tiny_state_dict, tiny_cfg)
    ours = flatten(tiny_models)
    theirs = flatten(params)
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_array_equal(np.asarray(ours[k]), np.asarray(theirs[k]),
                                      err_msg=k)


def test_missing_source_key_raises(tiny_cfg, tiny_state_dict):
    sd = dict(tiny_state_dict)
    victim = next(k for k in sd if "diffusion_model" in k)
    sd.pop(victim)
    with pytest.raises(KeyError, match="missing source key"):
        convert.convert(sd, tiny_cfg)


def test_unconsumed_source_key_raises(tiny_cfg, tiny_state_dict):
    sd = dict(tiny_state_dict)
    sd["model.diffusion_model.mystery.weight"] = np.zeros(3)
    with pytest.raises(KeyError, match="unconsumed"):
        convert.convert(sd, tiny_cfg)


def test_known_extras_ignored(tiny_cfg, tiny_state_dict):
    sd = dict(tiny_state_dict)
    sd["model_ema.decay"] = np.zeros(1)
    sd["betas"] = np.zeros(1000)
    sd["posterior_variance"] = np.zeros(1000)
    sd["cond_stage_model.transformer.text_model.embeddings.position_ids"] = \
        np.arange(16)[None]
    convert.convert(sd, tiny_cfg)  # should not raise


def test_conv_kernel_layout(tiny_cfg, tiny_state_dict):
    """OIHW -> HWIO (the torch->TPU layout flip)."""
    src = tiny_state_dict["model.diffusion_model.input_blocks.0.0.weight"]
    params = convert.convert(tiny_state_dict, tiny_cfg)
    dst = np.asarray(params["diffusion"]["conv_in"]["kernel"])
    o, i, kh, kw = src.shape
    assert dst.shape == (kh, kw, i, o)
    np.testing.assert_array_equal(dst, np.transpose(src, (2, 3, 1, 0)))


def test_linear_kernel_layout(tiny_cfg, tiny_state_dict):
    src = tiny_state_dict[
        "cond_stage_model.transformer.text_model.encoder.layers.0.mlp.fc1.weight"]
    params = convert.convert(tiny_state_dict, tiny_cfg)
    dst = np.asarray(params["clip"]["layers"][0]["fc1"]["kernel"])
    np.testing.assert_array_equal(dst, src.T)


def test_vae_attention_1x1_conv_to_linear(tiny_cfg, tiny_state_dict):
    """(C,C,1,1) conv weights become (C,C) linear kernels, q/k/v unfused
    (vs ref model_converter.py:1025-1030 which fuses them)."""
    src = tiny_state_dict["first_stage_model.encoder.mid.attn_1.q.weight"]
    assert src.ndim == 4 and src.shape[2:] == (1, 1)
    params = convert.convert(tiny_state_dict, tiny_cfg)
    dst = np.asarray(params["encoder"]["mid"]["attn"]["attn"]["q"]["kernel"])
    np.testing.assert_array_equal(dst, src[:, :, 0, 0].T)


def test_dtype_cast(tiny_cfg, tiny_state_dict):
    import jax.numpy as jnp

    params = convert.convert(tiny_state_dict, tiny_cfg, dtype=jnp.bfloat16)
    leaf = params["diffusion"]["conv_in"]["kernel"]
    assert leaf.dtype == jnp.bfloat16


def test_torch_ckpt_load_path(tiny_cfg, tiny_state_dict, tmp_path):
    """The reference's .ckpt ingestion path: torch pickle with a state_dict
    wrapper (ref model_converter.py:5)."""
    torch = pytest.importorskip("torch")

    ckpt = {"state_dict": {k: torch.as_tensor(np.asarray(v).copy())
                           for k, v in tiny_state_dict.items()},
            "global_step": 470000}
    path = str(tmp_path / "tiny.ckpt")
    torch.save(ckpt, path)
    sd = convert.load_state_dict(path)
    assert "global_step" not in sd or True  # only state_dict is used
    params = convert.convert({k: v for k, v in sd.items()}, tiny_cfg)
    got = np.asarray(params["diffusion"]["conv_in"]["kernel"])
    expect = np.transpose(
        tiny_state_dict["model.diffusion_model.input_blocks.0.0.weight"],
        (2, 3, 1, 0))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_synthetic_state_dict_is_complete(tiny_cfg):
    sd = convert.synthetic_state_dict(tiny_cfg)
    # no bias-less norms, no stray Nones
    assert all(isinstance(v, np.ndarray) or hasattr(v, "shape") for v in sd.values())
    params = convert.convert(sd, tiny_cfg)
    assert set(params) == {"clip", "encoder", "decoder", "diffusion"}
