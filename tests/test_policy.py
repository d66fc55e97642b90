"""Dtype-policy behavior: the bf16 production path must stay numerically
close to the fp32 parity path (fp32 norms/softmax are the guard rails)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import psnr

from pytorch_stable_diffusion_tpu.core.dtypes import BF16, FP32, MIXED, cast_pytree
from pytorch_stable_diffusion_tpu.models import unet as unet_mod


def test_policy_dtypes():
    assert BF16.param_dtype == jnp.bfloat16
    assert BF16.norm_dtype == jnp.float32
    assert MIXED.param_dtype == jnp.float32
    assert MIXED.compute_dtype == jnp.bfloat16


def test_cast_pytree_only_floats():
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32)}
    out = cast_pytree(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32


def test_unet_bf16_close_to_fp32(tiny_cfg, tiny_models):
    rng = np.random.RandomState(0)
    lat = rng.randn(1, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(1, tiny_cfg.clip.max_len, tiny_cfg.unet.d_context).astype(np.float32)

    f32 = np.asarray(jax.jit(lambda p, l, c: unet_mod.apply(
        p, l, c, 501, tiny_cfg.unet, FP32))(
        tiny_models["diffusion"], jnp.asarray(lat), jnp.asarray(ctx)))

    bf_params = cast_pytree(tiny_models["diffusion"], jnp.bfloat16)
    bf = np.asarray(jax.jit(lambda p, l, c: unet_mod.apply(
        p, l.astype(jnp.bfloat16), c.astype(jnp.bfloat16), 501,
        tiny_cfg.unet, BF16))(
        bf_params, jnp.asarray(lat), jnp.asarray(ctx))).astype(np.float32)

    assert bf.shape == f32.shape
    # bf16 has ~3 decimal digits; demand basic agreement, not bit parity
    assert psnr(f32, bf) > 25, psnr(f32, bf)


def test_bf16_pipeline_end_to_end(tiny_cfg, tiny_models, tiny_tokenizer):
    import pytorch_stable_diffusion_tpu as sdt

    cfg16 = dataclasses.replace(tiny_cfg, policy=BF16)
    models16 = {k: cast_pytree(v, jnp.bfloat16) for k, v in tiny_models.items()}
    img16 = sdt.generate("a cat", models=models16, tokenizer=tiny_tokenizer,
                         seed=5, n_inference_steps=2, config=cfg16,
                         height=16, width=16)
    img32 = sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                         seed=5, n_inference_steps=2, config=tiny_cfg,
                         height=16, width=16)
    assert img16.dtype == np.uint8 and img16.shape == img32.shape
    # same seed, same noise: images should agree to bf16 tolerance
    diff = np.abs(img16.astype(int) - img32.astype(int))
    assert diff.mean() < 8.0, diff.mean()
