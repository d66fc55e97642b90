"""Textual inversion (weights/textual_inversion.py) and long-prompt
window encoding (tokenizer.encode_windows + pipeline long_prompts).

Both are TPU-native extensions over the reference (which has neither);
semantics follow the community standards: A1111/diffusers embedding file
formats, trigger-word expansion before BPE, 77-token windows whose hiddens
concatenate into one long cross-attention context.
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.weights import textual_inversion as ti

H = W = 16
N_STEPS = 2


# ------------------------------------------------------- tokenizer plumbing
def test_placeholder_expansion(tiny_tokenizer):
    tok = tiny_tokenizer.clone()
    tok.add_placeholder("<cat-toy>", [900, 901])
    ids = tok.tokenize("a photo of <cat-toy>")
    base = tiny_tokenizer.tokenize("a photo of")
    assert ids == base + [900, 901]
    # case-insensitive (CLIP lowercases first)
    assert tok.tokenize("<CAT-TOY>") == [900, 901]
    # the original tokenizer is untouched (clone isolation)
    assert "<cat-toy>" not in tiny_tokenizer.placeholders


def test_encode_windows(tiny_tokenizer):
    L = tiny_tokenizer.max_len
    short = tiny_tokenizer.encode_windows("a cat")
    assert len(short) == 1 and short[0] == tiny_tokenizer.encode("a cat")
    long_text = " ".join(["cat"] * (L - 2 + 3))  # spills into window 2
    wins = tiny_tokenizer.encode_windows(long_text)
    assert len(wins) == 2
    assert all(len(w) == L for w in wins)
    assert wins[0][0] == tiny_tokenizer.sot and wins[1][0] == tiny_tokenizer.sot
    # empty prompt still produces one (sot, eot, pad...) window
    assert len(tiny_tokenizer.encode_windows("")) == 1


# ----------------------------------------------------------- add_embeddings
def test_add_embeddings_and_generate(tiny_cfg, tiny_models, tiny_tokenizer):
    d = tiny_cfg.clip.d_model
    rng = np.random.RandomState(0)
    emb = rng.randn(2, d).astype(np.float32)
    models, tok, cfg = ti.add_embeddings(
        tiny_models, tiny_tokenizer, tiny_cfg, {"<cat-toy>": emb})

    base_rows = np.asarray(tiny_models["clip"]["token_embedding"]).shape[0]
    assert np.asarray(models["clip"]["token_embedding"]).shape == (base_rows + 2, d)
    assert cfg.clip.vocab_size == base_rows + 2
    assert tok.tokenize("<cat-toy>") == [base_rows, base_rows + 1]
    np.testing.assert_array_equal(
        np.asarray(models["clip"]["token_embedding"])[base_rows:], emb)

    img1 = sdt.generate("a photo of <cat-toy>", "", models=models,
                        tokenizer=tok, config=cfg, n_inference_steps=N_STEPS,
                        height=H, width=W, seed=0)
    img2 = sdt.generate("a photo of cat", "", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS,
                        height=H, width=W, seed=0)
    assert img1.shape == (H, W, 3)
    assert np.abs(img1.astype(np.int32) - img2.astype(np.int32)).max() > 0


def test_add_embeddings_dim_mismatch(tiny_cfg, tiny_models, tiny_tokenizer):
    with pytest.raises(ValueError, match="dim"):
        ti.add_embeddings(tiny_models, tiny_tokenizer, tiny_cfg,
                          {"x": np.zeros((1, 7), np.float32)})


# ------------------------------------------------------------- file formats
def test_load_embedding_a1111_pt(tmp_path):
    import torch

    emb = np.random.RandomState(1).randn(3, 32).astype(np.float32)
    path = str(tmp_path / "cat_toy.pt")
    torch.save({"string_to_param": {"*": torch.tensor(emb)},
                "name": "<cat-toy>"}, path)
    out = ti.load_embedding(path)
    assert list(out) == ["<cat-toy>"]
    np.testing.assert_allclose(out["<cat-toy>"], emb)
    # token override
    assert list(ti.load_embedding(path, token="<x>")) == ["<x>"]


def test_load_embedding_safetensors(tmp_path):
    from safetensors.numpy import save_file

    emb = np.random.RandomState(2).randn(2, 32).astype(np.float32)
    a1111 = str(tmp_path / "style.safetensors")
    save_file({"emb_params": emb}, a1111)
    out = ti.load_embedding(a1111)
    assert list(out) == ["style"]  # file stem is the trigger
    np.testing.assert_allclose(out["style"], emb)

    dif = str(tmp_path / "thing.safetensors")
    save_file({"<thing-token>": emb}, dif)
    out = ti.load_embedding(dif)
    assert list(out) == ["<thing-token>"]


def test_api_with_textual_inversion(tiny_cfg, tiny_models, tiny_tokenizer):
    d = tiny_cfg.clip.d_model
    emb = np.random.RandomState(3).randn(1, d).astype(np.float32)
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    sd2 = sd.with_textual_inversion(emb, token="<sty>")
    img = sd2.txt2img("a cat in <sty>", n_inference_steps=N_STEPS,
                      height=H, width=W, seed=0)
    assert img.shape == (H, W, 3)
    # original untouched
    assert "<sty>" not in sd.tokenizer.placeholders


# ------------------------------------------------------------- long prompts
def test_long_prompts_extend_context(tiny_cfg, tiny_models, tiny_tokenizer):
    L = tiny_cfg.clip.max_len
    long_text = " ".join(["cat"] * (L + 5))  # 2 windows
    img_long = sdt.generate(long_text, "a dog", models=tiny_models,
                            tokenizer=tiny_tokenizer, config=tiny_cfg,
                            n_inference_steps=N_STEPS, height=H, width=W,
                            seed=0, long_prompts=True)
    img_trunc = sdt.generate(long_text, "a dog", models=tiny_models,
                             tokenizer=tiny_tokenizer, config=tiny_cfg,
                             n_inference_steps=N_STEPS, height=H, width=W,
                             seed=0)
    assert img_long.shape == (H, W, 3)
    # the spilled tokens actually condition the image
    assert np.abs(img_long.astype(np.int32) - img_trunc.astype(np.int32)).max() > 0


def test_long_prompts_short_is_identical(tiny_cfg, tiny_models, tiny_tokenizer):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    a = sdt.generate("a cat", "a dog", long_prompts=True, **kw)
    b = sdt.generate("a cat", "a dog", **kw)
    np.testing.assert_array_equal(a, b)  # k == 1 squeezes to the plain path


def test_long_prompts_sdxl(xl_bundle, tiny_tokenizer):
    """Dual-tower long prompts: window-concat context from BOTH towers,
    pooled conditioning from window 0 (A1111/sd_embed convention)."""
    cfg, models = xl_bundle
    L = cfg.clip.max_len
    long_text = " ".join(["cat"] * (L + 5))  # 2 windows
    kw = dict(models=models, tokenizer=tiny_tokenizer, config=cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    img_long = sdt.generate(long_text, "a dog", long_prompts=True, **kw)
    img_trunc = sdt.generate(long_text, "a dog", **kw)
    assert img_long.shape == (H, W, 3)
    # the spilled tokens condition the image
    assert np.abs(img_long.astype(np.int32)
                  - img_trunc.astype(np.int32)).max() > 0
    # short prompts through the window path squeeze to the plain path
    a = sdt.generate("a cat", "a dog", long_prompts=True, **kw)
    b = sdt.generate("a cat", "a dog", **kw)
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------- SDXL dual tower
@pytest.fixture(scope="module")
def xl_bundle():
    import jax

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(11)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    return cfg, models


def test_load_embedding_sdxl_safetensors(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.RandomState(4)
    l, g = rng.randn(2, 768).astype(np.float32), \
        rng.randn(2, 1280).astype(np.float32)
    path = str(tmp_path / "xlsty.safetensors")
    save_file({"clip_l": l, "clip_g": g}, path)
    out = ti.load_embedding(path)
    assert list(out) == ["xlsty"]
    np.testing.assert_allclose(out["xlsty"]["clip_l"], l)
    np.testing.assert_allclose(out["xlsty"]["clip_g"], g)

    save_file({"clip_l": l, "clip_g": g[:1]}, path)
    with pytest.raises(ValueError, match="mismatched vector counts"):
        ti.load_embedding(path)


def test_sdxl_dual_tower_add_and_generate(xl_bundle, tiny_tokenizer):
    cfg, models = xl_bundle
    d1, d2 = cfg.clip.d_model, cfg.clip2.d_model
    rng = np.random.RandomState(5)
    pair = {"clip_l": rng.randn(2, d1).astype(np.float32),
            "clip_g": rng.randn(2, d2).astype(np.float32)}
    out_models, tok, out_cfg = ti.add_embeddings(
        models, tiny_tokenizer, cfg, {"<xl-sty>": pair})

    base = np.asarray(models["clip"]["token_embedding"]).shape[0]
    assert np.asarray(out_models["clip"]["token_embedding"]).shape == \
        (base + 2, d1)
    assert np.asarray(out_models["clip2"]["token_embedding"]).shape == \
        (base + 2, d2)
    assert out_cfg.clip.vocab_size == out_cfg.clip2.vocab_size == base + 2
    assert tok.tokenize("<xl-sty>") == [base, base + 1]

    img1 = sdt.generate("a photo of <xl-sty>", "", models=out_models,
                        tokenizer=tok, config=out_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    img2 = sdt.generate("a photo of", "", models=out_models, tokenizer=tok,
                        config=out_cfg, n_inference_steps=N_STEPS,
                        height=H, width=W, seed=0)
    assert img1.shape == (H, W, 3)
    assert np.abs(img1.astype(np.int32) - img2.astype(np.int32)).max() > 0


def test_sdxl_rejects_single_tower_embedding(xl_bundle, tiny_tokenizer):
    cfg, models = xl_bundle
    with pytest.raises(ValueError, match="dual-tower"):
        ti.add_embeddings(models, tiny_tokenizer, cfg,
                          {"x": np.zeros((1, cfg.clip.d_model), np.float32)})


def test_single_tower_rejects_dual_embedding(tiny_cfg, tiny_models,
                                             tiny_tokenizer):
    pair = {"clip_l": np.zeros((1, 768), np.float32),
            "clip_g": np.zeros((1, 1280), np.float32)}
    with pytest.raises(ValueError, match="single text tower"):
        ti.add_embeddings(tiny_models, tiny_tokenizer, tiny_cfg,
                          {"<x>": pair})


def test_api_dual_dict_needs_token(xl_bundle, tiny_tokenizer):
    cfg, models = xl_bundle
    sd = sdt.StableDiffusion(models, tiny_tokenizer, cfg)
    pair = {"clip_l": np.zeros((1, cfg.clip.d_model), np.float32),
            "clip_g": np.zeros((1, cfg.clip2.d_model), np.float32)}
    with pytest.raises(ValueError, match="token="):
        sd.with_textual_inversion(pair)
    sd2 = sd.with_textual_inversion(pair, token="<s>")
    assert "<s>" in sd2.tokenizer.placeholders
