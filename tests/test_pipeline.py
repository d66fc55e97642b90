"""End-to-end pipeline parity + semantics (SURVEY §4.3).

Full-pipeline parity feeds identical recorded noise to our compiled scan and
to the torch oracle pipeline (the SURVEY §7 RNG-parity resolution), so the
comparison is deterministic; PSNR > 40 dB is the BASELINE.json bar, and with
shared fp32 noise we expect far above it.
"""

import jax
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from conftest import psnr, to_nchw, to_nhwc

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.pipeline import _run_generate
from pytorch_stable_diffusion_tpu.weights import convert

N_STEPS = 3
H = W = 16  # latent 8x8 with the tiny VAE (factor 2)


@pytest.fixture(scope="module")
def quirk_cfg(tiny_cfg):
    import dataclasses

    return dataclasses.replace(tiny_cfg, reference_quirks=True)


@pytest.fixture(scope="module")
def noises():
    rng = np.random.RandomState(7)
    return {
        "latent_init": rng.randn(1, 8, 8, 4).astype(np.float32),
        "sampler_noise": rng.randn(N_STEPS, 1, 8, 8, 4).astype(np.float32),
        "encoder_noise": rng.randn(1, 8, 8, 4).astype(np.float32),
    }


def _tokens(tok, text):
    return np.asarray([tok.encode(text)], np.int32)


@pytest.mark.parametrize("quirks", [True, False])
def test_txt2img_full_parity(tiny_cfg, quirk_cfg, tiny_models, tiny_state_dict,
                             tiny_tokenizer, noises, quirks):
    cfg = quirk_cfg if quirks else tiny_cfg
    img, lat = sdt.generate(
        "a photo of a cat", "a dog", models=tiny_models, tokenizer=tiny_tokenizer,
        seed=1337, n_inference_steps=N_STEPS, cfg_scale=5.0, config=cfg,
        height=H, width=W, fixed_noise=noises, return_latents=True)

    torch_sd = {k: torch.as_tensor(np.asarray(v)) for k, v in tiny_state_dict.items()}
    o_img, o_lat = oracle.oracle_generate(
        torch_sd,
        _tokens(tiny_tokenizer, "a photo of a cat").astype(np.int64),
        _tokens(tiny_tokenizer, "a dog").astype(np.int64),
        cfg, n_steps=N_STEPS, cfg_scale=5.0,
        latent_init=to_nchw(noises["latent_init"]),
        sampler_noise=np.stack([to_nchw(n) for n in noises["sampler_noise"]]),
        quirks=quirks)

    assert psnr(lat, to_nhwc(o_lat)) > 40, "latent PSNR below BASELINE bar"
    o_img_u8 = np.clip((to_nhwc(o_img)[0] + 1) * 127.5, 0, 255)
    assert np.abs(img.astype(np.float32) - o_img_u8).max() <= 1.0


def test_img2img_full_parity(tiny_cfg, tiny_models, tiny_state_dict,
                             tiny_tokenizer, noises):
    init = (np.random.RandomState(3).rand(H, W, 3) * 255).astype(np.uint8)
    strength = 0.7  # start_step = 3 - int(3*0.7) = 1
    img, lat = sdt.generate(
        "a cat", "", input_image=init, strength=strength, models=tiny_models,
        tokenizer=tiny_tokenizer, seed=1, n_inference_steps=N_STEPS,
        cfg_scale=5.0, config=tiny_cfg, height=H, width=W,
        fixed_noise=noises, return_latents=True)

    torch_sd = {k: torch.as_tensor(np.asarray(v)) for k, v in tiny_state_dict.items()}
    img_pre = (init.astype(np.float32) / 255.0) * 2 - 1
    start_step = 3 - int(3 * strength)
    o_img, o_lat = oracle.oracle_generate(
        torch_sd,
        _tokens(tiny_tokenizer, "a cat").astype(np.int64),
        _tokens(tiny_tokenizer, "").astype(np.int64),
        tiny_cfg, n_steps=N_STEPS, cfg_scale=5.0,
        latent_init=to_nchw(noises["latent_init"]),
        sampler_noise=np.stack([to_nchw(n) for n in noises["sampler_noise"]]),
        quirks=False,
        init_image=to_nchw(img_pre[None]),
        encoder_noise=to_nchw(noises["encoder_noise"]),
        start_step=start_step)
    assert psnr(lat, to_nhwc(o_lat)) > 40


def test_determinism_and_seed_sensitivity(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    a = sdt.generate("a cat", seed=5, **kw)
    b = sdt.generate("a cat", seed=5, **kw)
    c = sdt.generate("a cat", seed=6, **kw)
    assert (a == b).all()
    assert (a != c).any()
    assert a.dtype == np.uint8 and a.shape == (H, W, 3)


def test_batch_invariance_within_quantization(tiny_cfg, tiny_models, tiny_tokenizer):
    """Per-sample PRNG folding: sample 0 of a batch matches the single run up
    to uint8 rounding (XLA fuses differently per batch size)."""
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, seed=9,
              n_inference_steps=N_STEPS, config=tiny_cfg, height=H, width=W)
    single = sdt.generate("a cat", **kw)
    batch = sdt.generate_images(["a cat", "a dog"], **kw)
    assert batch.shape == (2, H, W, 3)
    assert np.abs(batch[0].astype(int) - single.astype(int)).max() <= 1
    assert (batch[0] != batch[1]).any()


def test_input_validation(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg)
    with pytest.raises(ValueError, match="strength"):
        sdt.generate("x", strength=1.5, **kw)
    with pytest.raises(ValueError, match="strength"):
        sdt.generate("x", strength=0.0, **kw)
    with pytest.raises(ValueError, match="sampler"):
        # NOTE: must stay a name that never becomes a real sampler — this
        # test once used "plms", which round 3 then implemented, silently
        # turning the expected-raise into a full default-size 512x512
        # 50-step CPU run that stalled the suite for hours.
        sdt.generate("x", sampler_name="not_a_sampler", **kw)
    with pytest.raises(ValueError, match="models"):
        sdt.generate("x", tokenizer=tiny_tokenizer)
    # exact-mode global attention past the validated streamed-kernel
    # scale must refuse up front: 4096^2 compiled but FAULTED the TPU
    # worker mid-run (round-5 queue 21) — the guard raises before any
    # trace/compile, so this is instant even on CPU
    with pytest.raises(ValueError, match="hypertile"):
        sdt.generate("x", height=4096, width=4096, **kw)
    # ... and the hypertile (fast-preset) path must NOT be refused
    from pytorch_stable_diffusion_tpu.models.config import with_hypertile
    from pytorch_stable_diffusion_tpu.pipeline import (
        MAX_VALIDATED_ATTN_TOKENS)
    ht = dict(kw, config=with_hypertile(tiny_cfg, 32))
    with pytest.raises(ValueError, match="motion"):
        # the n_frames/motion check sits AFTER the size guard, so
        # raising "motion" (not the size message) proves hypertile
        # configs pass the guard — still before any trace/compile
        sdt.generate("x", height=4096, width=4096, n_frames=2, **ht)
    assert (4096 // 8) ** 2 > MAX_VALIDATED_ATTN_TOKENS


def test_img2img_pil_input(tiny_cfg, tiny_models, tiny_tokenizer):
    """PIL images are resized to the target size (ref pipeline.py:156)."""
    PIL = pytest.importorskip("PIL.Image")
    arr = (np.random.RandomState(4).rand(40, 24, 3) * 255).astype(np.uint8)
    pil = PIL.fromarray(arr)  # wrong size on purpose -> must be resized
    img = sdt.generate("a cat", input_image=pil, strength=0.5,
                       models=tiny_models, tokenizer=tiny_tokenizer, seed=1,
                       n_inference_steps=N_STEPS, config=tiny_cfg,
                       height=H, width=W)
    assert img.shape == (H, W, 3)


def test_img2img_wrong_size_array_raises(tiny_cfg, tiny_models, tiny_tokenizer):
    bad = np.zeros((40, 24, 3), np.uint8)  # arrays are NOT resized
    with pytest.raises(ValueError, match="input image"):
        sdt.generate("a cat", input_image=bad, models=tiny_models,
                     tokenizer=tiny_tokenizer, config=tiny_cfg,
                     height=H, width=W)


def test_progress_callback(tiny_cfg, tiny_models, tiny_tokenizer, capfd):
    """Opt-in denoise progress (the reference's tqdm bar, ref pipeline.py:205)."""
    img = sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                       seed=2, n_inference_steps=N_STEPS, config=tiny_cfg,
                       height=H, width=W, progress=True)
    assert img.shape == (H, W, 3)
    out = capfd.readouterr().out
    assert f"denoise step {N_STEPS}/{N_STEPS}" in out


def test_do_cfg_false(tiny_cfg, tiny_models, tiny_tokenizer):
    img = sdt.generate("a cat", do_cfg=False, models=tiny_models,
                       tokenizer=tiny_tokenizer, seed=2,
                       n_inference_steps=N_STEPS, config=tiny_cfg,
                       height=H, width=W)
    assert img.shape == (H, W, 3) and img.dtype == np.uint8


def test_non_multiple_size_rejected(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError, match="multiples"):
        sdt.generate("x", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, height=17, width=16)
