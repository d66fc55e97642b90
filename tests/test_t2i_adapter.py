"""T2I-Adapter (models/t2i_adapter.py): lightweight spatial conditioning.

The reference has no adapter support; these tests pin the published
architecture (Mou et al. 2023, diffusers ``T2IAdapter`` full_adapter
layout) against a torch oracle built from the paper's description, the
converter round-trip, and the pipeline contracts: scale 0 is bitwise a
no-op, a non-trivial adapter changes the output, multi-adapter features
sum, and the once-per-generation evaluation composes with DeepCache/PAG.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import t2i_adapter
from pytorch_stable_diffusion_tpu.weights import diffusers as dz

N_STEPS = 2
H = W = 16


@pytest.fixture(scope="module")
def adapter_params(tiny_cfg):
    return t2i_adapter.init(jax.random.PRNGKey(7), tiny_cfg.unet,
                            downsample_factor=tiny_cfg.vae.downsample_factor)


@pytest.fixture(scope="module")
def hint_image():
    rng = np.random.RandomState(13)
    return rng.randint(0, 256, (H, W, 3)).astype(np.float32)


def _gen(models, tok, cfg, **kw):
    kw.setdefault("n_inference_steps", N_STEPS)
    kw.setdefault("height", H)
    kw.setdefault("width", W)
    kw.setdefault("seed", 0)
    return sdt.generate("a photo of a cat", "a dog", models=models,
                        tokenizer=tok, config=cfg, return_latents=True, **kw)


# ----------------------------------------------------------- architecture
def test_pixel_unshuffle_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(t2i_adapter.pixel_unshuffle(jnp.asarray(x), 4))
    want = torch.nn.functional.pixel_unshuffle(
        torch.from_numpy(x).permute(0, 3, 1, 2), 4).permute(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, want.numpy())


def test_apply_feature_shapes(tiny_cfg, adapter_params):
    f = tiny_cfg.vae.downsample_factor
    hint = jnp.zeros((1, H, W, 3), jnp.float32)
    feats = t2i_adapter.apply(adapter_params, hint, tiny_cfg.unet, f)
    assert len(feats) == len(tiny_cfg.unet.level_channels)
    for i, (ft, c) in enumerate(zip(feats, tiny_cfg.unet.level_channels)):
        assert ft.shape == (1, H // f // 2**i, W // f // 2**i, c)


def _torch_full_adapter(sd_t, hint_nchw, channels, factor, nrb, pools=None):
    """The published full adapter, straight from the paper/diffusers
    description: unshuffle -> conv_in 3x3 -> per block (avgpool per
    ``pools`` — default the SD layout's i>0 — 1x1 in_conv on channel
    change, nrb x (3x3 -> relu -> 1x1, residual))."""
    F = torch.nn.functional
    if pools is None:
        pools = [i > 0 for i in range(len(channels))]
    x = F.pixel_unshuffle(hint_nchw, factor)
    x = F.conv2d(x, sd_t["adapter.conv_in.weight"],
                 sd_t["adapter.conv_in.bias"], padding=1)
    feats = []
    for i in range(len(channels)):
        if pools[i]:
            x = F.avg_pool2d(x, 2)
        k = f"adapter.body.{i}.in_conv.weight"
        if k in sd_t:
            x = F.conv2d(x, sd_t[k], sd_t[f"adapter.body.{i}.in_conv.bias"])
        for j in range(nrb):
            p = f"adapter.body.{i}.resnets.{j}"
            h = F.conv2d(x, sd_t[f"{p}.block1.weight"],
                         sd_t[f"{p}.block1.bias"], padding=1)
            h = F.conv2d(F.relu(h), sd_t[f"{p}.block2.weight"],
                         sd_t[f"{p}.block2.bias"])
            x = x + h
        feats.append(x)
    return feats


def test_matches_torch_oracle(tiny_cfg, adapter_params, hint_image):
    f = tiny_cfg.vae.downsample_factor
    sd = dz.deconvert_t2i_adapter_diffusers(adapter_params, tiny_cfg)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
    hint = hint_image[None] / 255.0
    want = _torch_full_adapter(
        sd_t, torch.from_numpy(hint).permute(0, 3, 1, 2),
        tiny_cfg.unet.level_channels, f, 2)
    got = t2i_adapter.apply(adapter_params, jnp.asarray(hint),
                            tiny_cfg.unet, f)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   w.permute(0, 2, 3, 1).numpy(),
                                   rtol=2e-4, atol=2e-4)


# -------------------------------------------------------------- converter
def test_converter_round_trip(tiny_cfg, adapter_params):
    sd = dz.deconvert_t2i_adapter_diffusers(adapter_params, tiny_cfg)
    assert all(k.startswith("adapter.") for k in sd)
    back = dz.convert_t2i_adapter_diffusers(sd, tiny_cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        adapter_params, back)
    # unprefixed keys load too (raw FullAdapter module dump)
    bare = {k[len("adapter."):]: v for k, v in sd.items()}
    dz.convert_t2i_adapter_diffusers(bare, tiny_cfg)


def test_converter_rejects_leftover_and_missing(tiny_cfg, adapter_params):
    sd = dz.deconvert_t2i_adapter_diffusers(adapter_params, tiny_cfg)
    with pytest.raises(KeyError, match="unconsumed"):
        dz.convert_t2i_adapter_diffusers(
            dict(sd, **{"adapter.body.9.bogus.weight": np.zeros(1)}),
            tiny_cfg)
    missing = dict(sd)
    del missing["adapter.conv_in.weight"]
    with pytest.raises(KeyError, match="missing"):
        dz.convert_t2i_adapter_diffusers(missing, tiny_cfg)


def test_load_t2i_adapter_file_and_dir(tmp_path, tiny_cfg, adapter_params):
    import safetensors.numpy as st

    sd = dz.deconvert_t2i_adapter_diffusers(adapter_params, tiny_cfg)
    d = tmp_path / "adapter"
    d.mkdir()
    # ascontiguousarray: safetensors silently writes the raw buffer of a
    # transposed view (weights/save.py guards the production path)
    st.save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
                 str(d / "diffusion_pytorch_model.safetensors"))
    for path in (str(d), str(d / "diffusion_pytorch_model.safetensors")):
        tree = dz.load_t2i_adapter(path, tiny_cfg)
        np.testing.assert_array_equal(
            np.asarray(tree["conv_in"]["kernel"]),
            np.asarray(adapter_params["conv_in"]["kernel"]))


# --------------------------------------------------------------- pipeline
def test_scale_zero_is_bitwise_noop(tiny_cfg, tiny_models, tiny_tokenizer,
                                    adapter_params, hint_image):
    _, base_lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    models = dict(tiny_models, t2i_adapter=adapter_params)
    _, ad_lat = _gen(models, tiny_tokenizer, tiny_cfg,
                     adapter_image=hint_image, adapter_scale=0.0)
    np.testing.assert_array_equal(np.asarray(ad_lat), np.asarray(base_lat))


def test_adapter_changes_output(tiny_cfg, tiny_models, tiny_tokenizer,
                                adapter_params, hint_image):
    _, base_lat = _gen(tiny_models, tiny_tokenizer, tiny_cfg)
    models = dict(tiny_models, t2i_adapter=adapter_params)
    _, ad_lat = _gen(models, tiny_tokenizer, tiny_cfg,
                     adapter_image=hint_image)
    assert np.abs(np.asarray(ad_lat) - np.asarray(base_lat)).max() > 1e-6


def test_multi_adapter_features_sum(tiny_cfg, tiny_models, tiny_tokenizer,
                                    adapter_params, hint_image):
    one = dict(tiny_models, t2i_adapter=adapter_params)
    _, lat1 = _gen(one, tiny_tokenizer, tiny_cfg, adapter_image=hint_image,
                   adapter_scale=1.0)
    two = dict(tiny_models, t2i_adapter=[adapter_params, adapter_params])
    _, lat2 = _gen(two, tiny_tokenizer, tiny_cfg,
                   adapter_image=[hint_image, hint_image],
                   adapter_scale=[0.5, 0.5])
    np.testing.assert_allclose(np.asarray(lat2), np.asarray(lat1),
                               rtol=2e-4, atol=1e-5)


def test_composes_with_deepcache_and_pag(tiny_cfg, tiny_models,
                                         tiny_tokenizer, adapter_params,
                                         hint_image):
    models = dict(tiny_models, t2i_adapter=adapter_params)
    img, _ = _gen(models, tiny_tokenizer, tiny_cfg, adapter_image=hint_image,
                  n_inference_steps=3, deepcache=2)
    assert img.shape == (H, W, 3)
    img_pag, _ = _gen(models, tiny_tokenizer, tiny_cfg,
                      adapter_image=hint_image, pag_scale=1.0)
    assert img_pag.shape == (H, W, 3)


def test_errors(tiny_cfg, tiny_models, tiny_tokenizer, adapter_params,
                hint_image):
    with pytest.raises(ValueError, match="t2i_adapter"):
        _gen(tiny_models, tiny_tokenizer, tiny_cfg,
             adapter_image=hint_image)
    models = dict(tiny_models, t2i_adapter=[adapter_params, adapter_params])
    with pytest.raises(ValueError, match="adapter images"):
        _gen(models, tiny_tokenizer, tiny_cfg, adapter_image=hint_image)


def test_api_with_t2i_adapter(tiny_cfg, tiny_models, tiny_tokenizer,
                              adapter_params, hint_image):
    sd = sdt.StableDiffusion(models=tiny_models, tokenizer=tiny_tokenizer,
                             config=tiny_cfg)
    sd2 = sd.with_t2i_adapter(adapter_params)
    img = sd2.txt2img("a cat", seed=1, n_inference_steps=N_STEPS, height=H,
                      width=W, adapter_image=hint_image)
    assert img.shape == (H, W, 3)


# ------------------------------------------------- SDXL (full_adapter_xl)
@pytest.fixture(scope="module")
def xl_cfg():
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config

    return tiny_sdxl_config()


@pytest.fixture(scope="module")
def xl_models(xl_cfg):
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    key = jax.random.PRNGKey(7)
    return {
        "clip": clip.init(jax.random.fold_in(key, 0), xl_cfg.clip),
        "clip2": clip.init(jax.random.fold_in(key, 4), xl_cfg.clip2),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), xl_cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), xl_cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), xl_cfg.unet),
    }


@pytest.fixture(scope="module")
def xl_adapter(xl_cfg):
    return t2i_adapter.init(jax.random.PRNGKey(11), xl_cfg.unet,
                            downsample_factor=xl_cfg.vae.downsample_factor)


def test_adapter_layout_published_shapes():
    """full_adapter_xl at the REAL configs: n_levels+1 blocks, channels
    (320, 640, 1280, 1280), one pool before block 2, unshuffle 16 — the
    TencentARC t2iadapter_*_sdxl_1.0 layout; SD-1.5 keeps the per-level
    full_adapter."""
    from pytorch_stable_diffusion_tpu.models.config import (sd15_config,
                                                            sdxl_config)

    sd, xl = sd15_config(), sdxl_config()
    ch, pools, f = t2i_adapter.adapter_layout(sd.unet,
                                              sd.vae.downsample_factor)
    assert ch == (320, 640, 1280, 1280)
    assert pools == (False, True, True, True) and f == 8
    ch, pools, f = t2i_adapter.adapter_layout(xl.unet,
                                              xl.vae.downsample_factor)
    assert ch == (320, 640, 1280, 1280)
    assert pools == (False, False, True, False) and f == 16


def test_adapter_sites_plans():
    """Insertion plans at the real configs (the diffusers consumption
    order): SD-1.5's no-attention bottom level is backbone-only after its
    last block; SDXL's no-attention level 0 is backbone-only after its
    downsample and the extra feature lands on the bottleneck."""
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import (sd15_config,
                                                            sdxl_config)

    pre, post, mid = unet.adapter_sites(sd15_config().unet, 4)
    assert pre == {1: 0, 4: 1, 7: 2} and post == {10: 3} and mid is None
    pre, post, mid = unet.adapter_sites(sdxl_config().unet, 4)
    assert pre == {4: 1, 7: 2} and post == {2: 0} and mid == 3
    with pytest.raises(ValueError, match="adapter features"):
        unet.adapter_sites(sdxl_config().unet, 2)


def test_xl_feature_shapes(xl_cfg, xl_adapter):
    """XL chain starts at latent/2 (unshuffle 2f) and the tiny 2-level
    config needs no pool at all: every feature at latent/2."""
    f2 = xl_cfg.vae.downsample_factor * 2
    hint = jnp.zeros((1, H, W, 3), jnp.float32)
    feats = t2i_adapter.apply(xl_adapter, hint, xl_cfg.unet,
                              xl_cfg.vae.downsample_factor)
    lc = xl_cfg.unet.level_channels
    assert len(feats) == len(lc) + 1
    for ft, c in zip(feats, (*lc, lc[-1])):
        assert ft.shape == (1, H // f2, W // f2, c)


def test_xl_matches_torch_oracle(xl_cfg, xl_adapter, hint_image):
    ch, pools, factor = t2i_adapter.adapter_layout(
        xl_cfg.unet, xl_cfg.vae.downsample_factor)
    sd = dz.deconvert_t2i_adapter_diffusers(xl_adapter, xl_cfg)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd.items()}
    hint = hint_image[None] / 255.0
    want = _torch_full_adapter(
        sd_t, torch.from_numpy(hint).permute(0, 3, 1, 2), ch, factor, 2,
        pools)
    got = t2i_adapter.apply(xl_adapter, jnp.asarray(hint), xl_cfg.unet,
                            xl_cfg.vae.downsample_factor)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   w.permute(0, 2, 3, 1).numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_xl_converter_round_trip(xl_cfg, xl_adapter):
    sd = dz.deconvert_t2i_adapter_diffusers(xl_adapter, xl_cfg)
    # tiny XL channels (16, 32, 32): the only in_conv sits at block 1
    assert "adapter.body.1.in_conv.weight" in sd
    assert "adapter.body.2.in_conv.weight" not in sd
    back = dz.convert_t2i_adapter_diffusers(sd, xl_cfg)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        xl_adapter, back)


def test_xl_mid_feature_consumed(xl_cfg, xl_models):
    """All-zero features are a bitwise no-op; making ONLY the extra
    (bottleneck) feature non-zero changes the output — proving the
    n_levels+1-th feature is consumed at the mid block."""
    from pytorch_stable_diffusion_tpu.models import unet

    u = xl_cfg.unet
    rs = np.random.RandomState(0)
    lat = jnp.asarray(rs.randn(1, 8, 8, u.in_channels), jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 16, u.d_context), jnp.float32)
    add = jnp.asarray(rs.randn(1, u.add_embed_dim), jnp.float32)
    lc = u.level_channels
    zero_feats = [jnp.zeros((1, 4, 4, c), jnp.float32)
                  for c in (*lc, lc[-1])]
    base = unet.apply(xl_models["diffusion"], lat, ctx, 10, u, add_cond=add)
    same = unet.apply(xl_models["diffusion"], lat, ctx, 10, u, add_cond=add,
                      adapter=zero_feats)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    mid_only = list(zero_feats)
    mid_only[-1] = jnp.asarray(rs.randn(1, 4, 4, lc[-1]), jnp.float32)
    diff = unet.apply(xl_models["diffusion"], lat, ctx, 10, u, add_cond=add,
                      adapter=mid_only)
    assert np.abs(np.asarray(diff) - np.asarray(base)).max() > 1e-6


def test_xl_pipeline_end_to_end(xl_cfg, xl_models, tiny_tokenizer,
                                xl_adapter, hint_image):
    models = dict(xl_models, t2i_adapter=xl_adapter)
    kw = dict(models=models, tokenizer=tiny_tokenizer, config=xl_cfg,
              n_inference_steps=N_STEPS, height=H, width=W, seed=0,
              return_latents=True)
    _, base = sdt.generate("a cat", "", **dict(kw, models=xl_models))
    _, noop = sdt.generate("a cat", "", adapter_image=hint_image,
                           adapter_scale=0.0, **kw)
    # scale 0 bitwise gates the HINT (same graph)...
    _, noop_b = sdt.generate("a cat", "",
                             adapter_image=255.0 - hint_image,
                             adapter_scale=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(noop), np.asarray(noop_b))
    # ...and matches the adapter-free graph up to XLA fusion-order noise
    # (the extra zero-adds shift fusion boundaries -> reduction order in
    # the norms; ~1e-6 relative on CPU)
    np.testing.assert_allclose(np.asarray(noop), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
    _, on = sdt.generate("a cat", "", adapter_image=hint_image, **kw)
    assert np.abs(np.asarray(on) - np.asarray(base)).max() > 1e-3
