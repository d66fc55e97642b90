"""A1111 prompt-emphasis syntax: (word:1.3) / [word] per-token weighting
with mean-restoring renormalization of the encoder hidden states.

The reference has no emphasis support; semantics follow the A1111
standard: nested brackets multiply, explicit (x:w) sets the multiplier,
escapes produce literals, each long-prompt window renormalizes
independently (A1111 processes 75-token chunks independently).
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.weights.tokenizer import (
    parse_prompt_attention)

H = W = 16
N_STEPS = 2


# ---------------------------------------------------------------- parser
def test_parse_basic():
    assert parse_prompt_attention("a (cat) dog") == \
        [["a ", 1.0], ["cat", 1.1], [" dog", 1.0]]
    assert parse_prompt_attention("(cat:1.5)") == [["cat", 1.5]]
    assert parse_prompt_attention("[cat]") == [["cat", 1.0 / 1.1]]
    assert parse_prompt_attention("plain") == [["plain", 1.0]]
    assert parse_prompt_attention("") == [["", 1.0]]


def test_parse_nesting_multiplies():
    out = parse_prompt_attention("((cat))")
    assert out == [["cat", pytest.approx(1.1 * 1.1)]]
    out = parse_prompt_attention("(a (b:2.0) c)")
    assert out == [["a ", pytest.approx(1.1)], ["b", pytest.approx(2.2)],
                   [" c", pytest.approx(1.1)]]


def test_parse_escapes_and_unbalanced():
    assert parse_prompt_attention(r"a \(literal\) x") == \
        [["a (literal) x", 1.0]]
    assert parse_prompt_attention("(unclosed") == [["unclosed", 1.1]]
    assert parse_prompt_attention("a:b") == [["a:b", 1.0]]


def test_tokenize_weighted(tiny_tokenizer):
    ids, ws = tiny_tokenizer.tokenize_weighted("a (cat:1.5) dog")
    plain = tiny_tokenizer.tokenize("a cat dog")
    assert ids == plain
    n_cat = len(tiny_tokenizer.tokenize("cat"))
    assert set(ws) == {1.0, 1.5} and ws.count(1.5) == n_cat

    full, wfull = tiny_tokenizer.encode_weighted("a (cat:1.5) dog")
    assert full == tiny_tokenizer.encode("a cat dog")
    assert len(wfull) == len(full) and wfull[0] == 1.0 and wfull[-1] == 1.0


def test_encode_windows_weighted(tiny_tokenizer):
    L = tiny_tokenizer.max_len
    text = "(" + " ".join(["cat"] * (L + 3)) + ":1.3)"
    wins, wws = tiny_tokenizer.encode_windows_weighted(text)
    plain = tiny_tokenizer.encode_windows(" ".join(["cat"] * (L + 3)))
    assert wins == plain and len(wws) == len(wins)
    assert all(len(w) == L for w in wws)
    assert wws[0][0] == 1.0 and 1.3 in wws[0] and 1.3 in wws[1]


# --------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, **kw)


def test_weight_one_is_identity(tiny_cfg, tiny_models, tiny_tokenizer):
    """No emphasis syntax -> all weights 1.0 -> bitwise-identical output
    (the renormalization is exact at w == 1)."""
    a = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    b = _gen(tiny_models, tiny_tokenizer, tiny_cfg, emphasis=True)
    np.testing.assert_array_equal(a, b)


def test_emphasis_conditions_output(tiny_cfg, tiny_models, tiny_tokenizer):
    base = sdt.generate("a cat", "", models=tiny_models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W,
                        seed=0, emphasis=True)
    up = sdt.generate("a (cat:1.8)", "", models=tiny_models,
                      tokenizer=tiny_tokenizer, config=tiny_cfg,
                      n_inference_steps=N_STEPS, height=H, width=W,
                      seed=0, emphasis=True)
    assert np.abs(base.astype(np.int32) - up.astype(np.int32)).max() > 0
    # syntax is inert without the flag: brackets tokenize as punctuation
    raw = sdt.generate("a (cat:1.8)", "", models=tiny_models,
                       tokenizer=tiny_tokenizer, config=tiny_cfg,
                       n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    assert np.abs(raw.astype(np.int32) - up.astype(np.int32)).max() > 0


def test_emphasis_with_long_prompts(tiny_cfg, tiny_models, tiny_tokenizer):
    L = tiny_cfg.clip.max_len
    text = " ".join(["cat"] * (L + 5))
    a = _gen(tiny_models, tiny_tokenizer, tiny_cfg, long_prompts=True)
    plain = sdt.generate(text, "a dog", models=tiny_models,
                         tokenizer=tiny_tokenizer, config=tiny_cfg,
                         n_inference_steps=N_STEPS, height=H, width=W,
                         seed=0, long_prompts=True)
    both = sdt.generate(text, "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W,
                        seed=0, long_prompts=True, emphasis=True)
    np.testing.assert_array_equal(plain, both)  # w == 1 identity per window
    emph = sdt.generate("(" + text + ":1.5)", "a dog", models=tiny_models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        n_inference_steps=N_STEPS, height=H, width=W,
                        seed=0, long_prompts=True, emphasis=True)
    assert np.abs(emph.astype(np.int32) - both.astype(np.int32)).max() > 0
    del a


def test_emphasis_sdxl(tiny_tokenizer):
    """Dual-tower: weights apply to both towers' hiddens; pooled stays
    unweighted — w == 1 is still an exact identity."""
    import jax

    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(21)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    a = _gen(models, tiny_tokenizer, cfg)
    b = _gen(models, tiny_tokenizer, cfg, emphasis=True)
    np.testing.assert_array_equal(a, b)
    up = sdt.generate("a (cat:1.8)", "a dog", models=models,
                      tokenizer=tiny_tokenizer, config=cfg,
                      n_inference_steps=N_STEPS, height=H, width=W,
                      seed=0, emphasis=True)
    assert np.abs(up.astype(np.int32) - b.astype(np.int32)).max() > 0
