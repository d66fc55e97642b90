"""A1111 workflow extras: BREAK keyword, standalone-VAE override, and
checkpoint merging.

No reference analogs; semantics follow A1111 (modules/sd_hijack BREAK
chunking, the "SD VAE" override, the Checkpoint Merger tab's weighted-sum
and add-difference modes).
"""

import numpy as np
import pytest

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.weights import convert as convert_mod
from pytorch_stable_diffusion_tpu.weights.merge import merge_models
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

H = W = 16
N_STEPS = 2


# ------------------------------------------------------------------ BREAK
def test_break_forces_window_boundary():
    tok = make_test_tokenizer(["a", "cat", "dog"], max_len=16)
    one = tok.encode_windows("a cat")
    assert len(one) == 1
    two = tok.encode_windows("a cat BREAK dog")
    assert len(two) == 2
    # first window: "a cat" then eot padding; second: "dog"
    assert two[0][:3] == one[0][:3]
    assert two[1][1] == tok.encode("dog")[1]
    # lowercase "break" is NOT the keyword
    assert len(tok.encode_windows("a break cat")) == 1


def test_break_weighted_alignment():
    tok = make_test_tokenizer(["a", "cat", "dog"], max_len=16)
    wins, ws = tok.encode_windows_weighted("(a:1.5) BREAK dog")
    assert len(wins) == 2 and len(ws) == 2
    assert ws[0][1] == 1.5      # "a" carries its weight in window 0
    assert all(w == 1.0 for w in ws[1])


def test_break_through_pipeline(tiny_models, tiny_tokenizer, tiny_cfg):
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              long_prompts=True)
    img_b = sdt.generate("a cat BREAK a dog", **kw)
    img_p = sdt.generate("a cat a dog", **kw)
    assert img_b.shape == (H, W, 3)
    assert (img_b != img_p).any()  # 2-window context vs 1-window


# ------------------------------------------------------------ VAE override
def _vae_sd(tiny_models, tiny_cfg, prefixed: bool):
    full = convert_mod.deconvert(tiny_models, tiny_cfg)
    vae = {k: v for k, v in full.items()
           if k.startswith("first_stage_model.")}
    if prefixed:
        return vae
    return {k[len("first_stage_model."):]: v for k, v in vae.items()}


def test_convert_vae_roundtrip(tiny_models, tiny_cfg):
    import jax

    for prefixed in (False, True):
        enc, dec = convert_mod.convert_vae(
            _vae_sd(tiny_models, tiny_cfg, prefixed), tiny_cfg)
        for got, want in ((enc, tiny_models["encoder"]),
                          (dec, tiny_models["decoder"])):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6), got, want)


def test_convert_vae_ignores_loss_keys(tiny_models, tiny_cfg):
    sd = _vae_sd(tiny_models, tiny_cfg, prefixed=False)
    sd["loss.logvar"] = np.zeros(1, np.float32)
    enc, dec = convert_mod.convert_vae(sd, tiny_cfg)  # no KeyError
    sd["decoder.bogus.weight"] = np.zeros(1, np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        convert_mod.convert_vae(sd, tiny_cfg)


def test_load_vae_file_and_wrapper(tmp_path, tiny_models, tiny_tokenizer,
                                   tiny_cfg):
    import torch

    sd = _vae_sd(tiny_models, tiny_cfg, prefixed=False)
    p = str(tmp_path / "test.vae.pt")
    torch.save({"state_dict": {k: torch.tensor(v) for k, v in sd.items()}},
               p)
    bundle = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    swapped = bundle.with_vae(p)
    kw = dict(seed=0, n_inference_steps=N_STEPS, height=H, width=W)
    # identical weights -> identical output through the swapped bundle
    np.testing.assert_array_equal(swapped.txt2img("a cat", **kw),
                                  bundle.txt2img("a cat", **kw))


# ----------------------------------------------------------------- merging
def test_merge_endpoints_and_adddiff(tiny_models, tiny_cfg):
    import jax

    other = jax.tree_util.tree_map(lambda x: x + 1.0, tiny_models)
    m0 = merge_models(tiny_models, other, 0.0)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), m0, tiny_models)
    m1 = merge_models(tiny_models, other, 1.0)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6), m1, other)
    # add-difference with C == B collapses to A + alpha*0 == A
    md = merge_models(tiny_models, other, 0.7, c=other)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6), md, tiny_models)


def test_merged_bundle_generates(tiny_models, tiny_tokenizer, tiny_cfg):
    import jax

    a = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    other = jax.tree_util.tree_map(lambda x: x * 0.5, tiny_models)
    m = a.merged_with(other, alpha=0.5)
    kw = dict(seed=0, n_inference_steps=N_STEPS, height=H, width=W)
    img = m.txt2img("a cat", **kw)
    assert img.shape == (H, W, 3)
    assert (img != a.txt2img("a cat", **kw)).any()


def test_break_auto_enables_windows(tiny_models, tiny_tokenizer, tiny_cfg):
    """BREAK is honored even without long_prompts=True (A1111 honors it
    unconditionally); regression: it used to BPE-encode literally."""
    kw = dict(models=tiny_models, tokenizer=tiny_tokenizer, config=tiny_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0)
    auto = sdt.generate("a cat BREAK dog", **kw)
    explicit = sdt.generate("a cat BREAK dog", long_prompts=True, **kw)
    np.testing.assert_array_equal(auto, explicit)
