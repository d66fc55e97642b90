"""A1111 hypernetworks (weights/hypernetwork.py).

No reference analog; semantics follow A1111's
``modules/hypernetworks/hypernetwork.py``: per-context-width residual MLP
pairs transforming the cross-attention context for k and v separately,
``x + net(x) * strength``.
"""

import collections

import numpy as np
import pytest

import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.weights import hypernetwork as hyper

H = W = 16
N_STEPS = 2
D = 32  # tiny config d_context


def _module_sd(rs, d, scale=0.05, gap=False, zero=False):
    """One HypernetworkModule state dict: Linear(d, 2d) -> act -> Linear(2d, d).
    ``gap=True`` mimics interleaved activation modules (indices 0, 2)."""
    import torch

    sd = collections.OrderedDict()
    sd["linear.0.weight"] = torch.tensor(
        rs.randn(2 * d, d).astype(np.float32) * scale)
    sd["linear.0.bias"] = torch.zeros(2 * d)
    i = 2 if gap else 1
    w2 = np.zeros((d, 2 * d), np.float32) if zero else \
        rs.randn(d, 2 * d).astype(np.float32) * scale
    sd[f"linear.{i}.weight"] = torch.tensor(w2)
    sd[f"linear.{i}.bias"] = torch.zeros(d)
    return sd


def _hn_file(tmp_path, rs, act="relu", zero=False, d=D):
    import torch

    obj = {
        d: (_module_sd(rs, d, gap=(act != "linear"), zero=zero),
            _module_sd(rs, d, gap=(act != "linear"), zero=zero)),
        "name": "test-hn", "step": 1000, "layer_structure": [1, 2, 1],
        "activation_func": act, "activate_output": False,
        "add_layer_norm": False, "use_dropout": False,
    }
    p = str(tmp_path / "hn.pt")
    torch.save(obj, p)
    return p


# ---------------------------------------------------------------- loader
def test_load_and_oracle(tmp_path):
    rs = np.random.RandomState(0)
    p = _hn_file(tmp_path, rs, act="relu")
    tree, (act, act_out) = hyper.load_hypernetwork(p)
    assert act == "relu" and act_out is False
    assert sorted(tree) == [str(D)]  # string keys (jax.export-serializable)
    mods = tree[str(D)]["k"]
    assert [list(m) for m in mods] == [["kernel", "bias"]] * 2
    assert mods[0]["kernel"].shape == (D, 2 * D)  # transposed to x @ W

    # numeric oracle: x + W2 @ relu(W1 @ x) with strength 0.5
    x = rs.randn(2, 5, D).astype(np.float32)
    ctx_k, ctx_v = hyper.apply_hypernetwork(
        tree, jnp.asarray(x), jnp.float32(0.5), activation="relu",
        activate_output=False)
    w1, b1 = mods[0]["kernel"], mods[0]["bias"]
    w2, b2 = mods[1]["kernel"], mods[1]["bias"]
    resid = np.maximum(x @ w1 + b1, 0.0) @ w2 + b2
    np.testing.assert_allclose(np.asarray(ctx_k), x + 0.5 * resid,
                               rtol=1e-5, atol=1e-5)
    # k and v nets are independent draws -> different outputs
    assert np.abs(np.asarray(ctx_k) - np.asarray(ctx_v)).max() > 1e-4


def test_strength_zero_is_identity(tmp_path):
    rs = np.random.RandomState(1)
    tree, meta = hyper.load_hypernetwork(_hn_file(tmp_path, rs))
    x = jnp.asarray(rs.randn(1, 4, D).astype(np.float32))
    ctx_k, ctx_v = hyper.apply_hypernetwork(tree, x, jnp.float32(0.0),
                                            activation=meta[0],
                                            activate_output=meta[1])
    np.testing.assert_array_equal(np.asarray(ctx_k), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ctx_v), np.asarray(x))


def test_layernorm_module_parses():
    sd = {
        "linear.0.weight": np.eye(4, dtype=np.float32),
        "linear.0.bias": np.zeros(4, np.float32),
        "linear.1.weight": np.ones(4, np.float32),   # LayerNorm scale
        "linear.1.bias": np.zeros(4, np.float32),
        "linear.2.weight": np.zeros((4, 4), np.float32),
        "linear.2.bias": np.zeros(4, np.float32),
    }
    mods = hyper._parse_module(sd)
    assert "ln_scale" in mods[1] and "kernel" in mods[2]
    # zero output layer -> residual 0 -> identity
    tree = {"4": {"k": mods, "v": mods}}
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3, 4), jnp.float32)
    ctx_k, _ = hyper.apply_hypernetwork(tree, x, jnp.float32(1.0),
                                        activation="linear",
                                        activate_output=False)
    np.testing.assert_array_equal(np.asarray(ctx_k), np.asarray(x))


def test_unknown_activation_rejected(tmp_path):
    import torch

    rs = np.random.RandomState(3)
    obj = {D: (_module_sd(rs, D), _module_sd(rs, D)),
           "activation_func": "frobnicate"}
    p = str(tmp_path / "bad.pt")
    torch.save(obj, p)
    with pytest.raises(ValueError, match="activation"):
        hyper.load_hypernetwork(p)


# -------------------------------------------------------------- pipeline
def _gen(models, tok, cfg, **kw):
    return sdt.generate("a cat", "a dog", models=models, tokenizer=tok,
                        config=cfg, n_inference_steps=N_STEPS, height=H,
                        width=W, seed=0, return_latents=True, **kw)


def test_pipeline_hypernetwork_changes_output(tmp_path, tiny_models,
                                              tiny_tokenizer, tiny_cfg):
    rs = np.random.RandomState(4)
    tree, meta = hyper.load_hypernetwork(_hn_file(tmp_path, rs))
    models = dict(tiny_models, hypernetwork=tree)
    img_h, _ = _gen(models, tiny_tokenizer, tiny_cfg, hypernetwork=meta)
    img_b, _ = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    assert np.mean(np.abs(img_h.astype(np.float32) - img_b)) > 0.5


def test_pipeline_zero_residual_matches_baseline(tmp_path, tiny_models,
                                                 tiny_tokenizer, tiny_cfg):
    """Zero output layers -> ctx_k == ctx_v == ctx; only the program shape
    differs (separate k/v linears vs the fused kv matmul), so latents agree
    to reduction-order tolerance."""
    rs = np.random.RandomState(5)
    tree, meta = hyper.load_hypernetwork(_hn_file(tmp_path, rs, zero=True))
    models = dict(tiny_models, hypernetwork=tree)
    _, lat_h = _gen(models, tiny_tokenizer, tiny_cfg, hypernetwork=meta)
    _, lat_b = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    np.testing.assert_allclose(np.asarray(lat_h), np.asarray(lat_b),
                               atol=1e-4, rtol=0)


def test_wrapper_with_hypernetwork(tmp_path, tiny_models, tiny_tokenizer,
                                   tiny_cfg):
    rs = np.random.RandomState(6)
    p = _hn_file(tmp_path, rs)
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    sd_h = sd.with_hypernetwork(p, strength=0.8)
    img = sd_h.txt2img("a cat", seed=0, n_inference_steps=N_STEPS,
                       height=H, width=W)
    base = sd.txt2img("a cat", seed=0, n_inference_steps=N_STEPS,
                      height=H, width=W)
    assert img.shape == (H, W, 3)
    assert (img != base).any()


def test_missing_width_rejected(tmp_path, tiny_models, tiny_tokenizer,
                                tiny_cfg):
    import torch

    rs = np.random.RandomState(7)
    obj = {768: (_module_sd(rs, 768, gap=True),
                 _module_sd(rs, 768, gap=True)),
           "activation_func": "relu"}
    p = str(tmp_path / "wrong.pt")
    torch.save(obj, p)
    tree, meta = hyper.load_hypernetwork(p)
    models = dict(tiny_models, hypernetwork=tree)
    with pytest.raises(ValueError, match="context width"):
        _gen(models, tiny_tokenizer, tiny_cfg, hypernetwork=meta)


def test_hypernetwork_composes_with_pag_and_sag(tmp_path, tiny_models,
                                                tiny_tokenizer, tiny_cfg):
    """PAG/SAG slice conditioning lanes out of the context — which under a
    hypernetwork is a (ctx_k, ctx_v) TUPLE (pipeline._lane)."""
    rs = np.random.RandomState(8)
    tree, meta = hyper.load_hypernetwork(_hn_file(tmp_path, rs))
    models = dict(tiny_models, hypernetwork=tree)
    img_p, _ = _gen(models, tiny_tokenizer, tiny_cfg, hypernetwork=meta,
                    pag_scale=1.0)
    img_s, _ = _gen(models, tiny_tokenizer, tiny_cfg, hypernetwork=meta,
                    sag_scale=0.75)
    assert img_p.shape == (H, W, 3) and img_s.shape == (H, W, 3)
    assert (img_p != img_s).any()


def test_hypernetwork_survives_bundle_clones(tmp_path, tiny_models,
                                             tiny_tokenizer, tiny_cfg):
    """with_* builders must keep an attached hypernetwork active
    (regression: clones built via __new__ dropped _hyper silently)."""
    rs = np.random.RandomState(9)
    p = _hn_file(tmp_path, rs)
    sd = sdt.StableDiffusion(tiny_models, tiny_tokenizer, tiny_cfg)
    kw = dict(seed=0, n_inference_steps=N_STEPS, height=H, width=W)
    base = sd.txt2img("a cat", **kw)
    hn = sd.with_hypernetwork(p, strength=0.8)
    chained = hn.merged_with(tiny_models, alpha=0.0)  # no-op merge
    img = chained.txt2img("a cat", **kw)
    assert (img != base).any()  # hypernetwork still active post-clone
    np.testing.assert_array_equal(img, hn.txt2img("a cat", **kw))
