"""IP-Adapter (Ye et al. 2023) — image-prompt conditioning.

No reference analog (text-only conditioning); semantics follow the
published h94/IP-Adapter checkpoints + diffusers:

  * CLIP vision tower: oracle-tested against an EXECUTED transformers
    ``CLIPVisionModelWithProjection`` with random weights,
  * decoupled cross-attention: oracle-tested against a torch
    re-implementation of the IPAttnProcessor contract
    (out_proj applied AFTER text-attn + scale * image-attn),
  * converter: exact key coverage, layer-count spec equals the published
    checkpoints (16 cross-attn layers for SD-1.5, 70 for SDXL),
  * pipeline: scale 0 reproduces the no-adapter output; scale > 0 steers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import clip_vision as cv
from pytorch_stable_diffusion_tpu.models.config import (UNetConfig,
                                                        sdxl_config)
from pytorch_stable_diffusion_tpu.ops import attention
from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw


# ----------------------------------------------------------- vision tower
@pytest.fixture(scope="module")
def hf_vision():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    cfg = cv.tiny_vision_config()
    hf_cfg = HFCfg(hidden_size=cfg.width, intermediate_size=cfg.d_ff,
                   num_hidden_layers=cfg.n_layers,
                   num_attention_heads=cfg.n_heads,
                   image_size=cfg.image_size, patch_size=cfg.patch_size,
                   projection_dim=cfg.proj_dim, hidden_act="gelu")
    torch.manual_seed(7)
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    return torch, cfg, model


def test_clip_vision_matches_transformers(hf_vision):
    torch, cfg, model = hf_vision
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = ipw.convert_clip_vision(sd, cfg)
    pixels = np.random.RandomState(0).randn(
        2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    ours = np.asarray(cv.apply_projected(params, jnp.asarray(pixels), cfg))
    with torch.no_grad():
        theirs = model(torch.tensor(pixels).permute(0, 3, 1, 2)).image_embeds
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=2e-4, atol=2e-5)


def test_clip_vision_penultimate_matches_transformers(hf_vision):
    torch, cfg, model = hf_vision
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = ipw.convert_clip_vision(sd, cfg)
    pixels = np.random.RandomState(1).randn(
        1, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    ours = np.asarray(cv.apply(params, jnp.asarray(pixels), cfg,
                               stop_at_layer=cfg.n_layers - 1))
    with torch.no_grad():
        hs = model(torch.tensor(pixels).permute(0, 3, 1, 2),
                   output_hidden_states=True).hidden_states[-2]
    np.testing.assert_allclose(ours, hs.numpy(), rtol=2e-4, atol=2e-5)


def test_preprocess_shapes_and_range():
    cfg = cv.tiny_vision_config()
    img = (np.random.RandomState(0).rand(cfg.image_size, cfg.image_size, 3)
           * 255).astype(np.uint8)
    out = cv.preprocess(img, cfg)
    assert out.shape == (1, cfg.image_size, cfg.image_size, 3)
    # normalization round-trips: out * std + mean must be the [0,1] image
    back = out[0] * cv.CLIP_STD + cv.CLIP_MEAN
    np.testing.assert_allclose(back, img / 255.0, atol=1e-6)


# ----------------------------------------------- decoupled cross-attention
def test_decoupled_attention_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(3)
    B, S, D, d_ctx, n_ip, heads = 2, 6, 16, 12, 4, 4
    p = attention.init(jax.random.PRNGKey(0), heads, D, d_cross=d_ctx,
                       in_bias=False)
    ipp = {"k": {"kernel": jnp.asarray(rs.randn(d_ctx, D), jnp.float32)},
           "v": {"kernel": jnp.asarray(rs.randn(d_ctx, D), jnp.float32)}}
    x = rs.randn(B, S, D).astype(np.float32)
    ctx = rs.randn(B, 8, d_ctx).astype(np.float32)
    ip_tok = rs.randn(B, n_ip, d_ctx).astype(np.float32)
    scale = 0.7
    ours = np.asarray(attention.apply(
        p, jnp.asarray(x), jnp.asarray(ctx), n_heads=heads,
        ip=(ipp, jnp.asarray(ip_tok), jnp.float32(scale))))

    # torch oracle: the IPAttnProcessor contract — q/out shared, separate
    # bias-free k/v for the image tokens, sum BEFORE to_out
    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    def heads_split(v):
        return v.reshape(v.shape[0], v.shape[1], heads, -1).transpose(1, 2)

    with torch.no_grad():
        q = heads_split(t(x) @ t(p["q"]["kernel"]))
        k = heads_split(t(ctx) @ t(p["k"]["kernel"]))
        v = heads_split(t(ctx) @ t(p["v"]["kernel"]))
        a_txt = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        k_ip = heads_split(t(ip_tok) @ t(ipp["k"]["kernel"]))
        v_ip = heads_split(t(ip_tok) @ t(ipp["v"]["kernel"]))
        a_ip = torch.nn.functional.scaled_dot_product_attention(q, k_ip, v_ip)
        merged = (a_txt + scale * a_ip).transpose(1, 2).reshape(B, S, D)
        want = merged @ t(p["out"]["kernel"]) + t(p["out"]["bias"])
    np.testing.assert_allclose(ours, want.numpy(), rtol=1e-4, atol=1e-5)


def test_ip_scale_zero_is_plain_cross_attention():
    rs = np.random.RandomState(4)
    p = attention.init(jax.random.PRNGKey(1), 2, 8, d_cross=8, in_bias=False)
    ipp = {"k": {"kernel": jnp.asarray(rs.randn(8, 8), jnp.float32)},
           "v": {"kernel": jnp.asarray(rs.randn(8, 8), jnp.float32)}}
    x = jnp.asarray(rs.randn(1, 5, 8), jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 3, 8), jnp.float32)
    tok = jnp.asarray(rs.randn(1, 2, 8), jnp.float32)
    base = attention.apply(p, x, ctx, n_heads=2)
    with_ip = attention.apply(p, x, ctx, n_heads=2,
                              ip=(ipp, tok, jnp.float32(0.0)))
    np.testing.assert_allclose(np.asarray(with_ip), np.asarray(base),
                               rtol=1e-6, atol=1e-7)


# ----------------------------------------------------------- layer plans
def test_sd15_plan_matches_published_checkpoint_layout():
    plan = ipw.ip_layer_plan(UNetConfig())
    # h94 ip-adapter_sd15: 16 cross-attn layers, integer keys 1..31 odd;
    # order down (6), up (9), mid (1)
    assert len(plan) == 16
    assert sum(k.startswith("enc") for k in plan) == 6
    assert sum(k.startswith("dec") for k in plan) == 9
    assert plan[-1] == "mid_0"
    assert plan[0].startswith("enc")
    assert plan[6].startswith("dec")


def test_sdxl_plan_has_70_layers():
    # h94 ip-adapter_sdxl: 140 to_{k,v}_ip tensors = 70 cross-attn layers
    plan = ipw.ip_layer_plan(sdxl_config().unet)
    assert len(plan) == 70
    assert sum(k.startswith("mid") for k in plan) == 10


# shared with the driver dryrun leg (weights/ip_adapter.py)
_synthetic_ip_state = ipw.synthetic_ip_state


def test_converter_coverage_and_shapes(tiny_cfg):
    cfg = tiny_cfg.unet
    state = _synthetic_ip_state(cfg)
    params = ipw.convert_ip_adapter(state, cfg)
    assert set(params["layers"]) == set(ipw.ip_layer_plan(cfg))
    assert ipw.num_image_tokens(params, cfg) == 4
    for lay in params["layers"].values():
        assert lay["k"]["kernel"].shape[0] == cfg.d_context
        assert "bias" not in lay["k"]
    # flat (.safetensors) layout converts identically
    flat = ipw.convert_ip_adapter(_synthetic_ip_state(cfg, flat=True), cfg)
    np.testing.assert_array_equal(flat["image_proj"]["proj"]["kernel"],
                                  params["image_proj"]["proj"]["kernel"])


def test_converter_rejects_malformed(tiny_cfg):
    cfg = tiny_cfg.unet
    # a bare-latents image_proj routes to the resampler path and must
    # fail loudly (no perceiver layers)
    state = _synthetic_ip_state(cfg)
    state["image_proj"] = {"latents": np.zeros((4, 8), np.float32)}
    with pytest.raises(ValueError, match="missing"):
        ipw.convert_ip_adapter(state, cfg)
    state = _synthetic_ip_state(cfg)
    first = sorted(state["ip_adapter"])[0]
    state["ip_adapter"].pop(first)
    with pytest.raises(ValueError):
        ipw.convert_ip_adapter(state, cfg)


# -------------------------------------------------------------- pipeline
@pytest.fixture(scope="module")
def ip_fixture(tiny_cfg):
    vis_cfg = cv.tiny_vision_config()
    vision = cv.init(jax.random.PRNGKey(11), vis_cfg)
    adapter = ipw.convert_ip_adapter(
        _synthetic_ip_state(tiny_cfg.unet, embed_dim=vis_cfg.proj_dim,
                            seed=5), tiny_cfg.unet)
    img = (np.random.RandomState(9).rand(
        vis_cfg.image_size, vis_cfg.image_size, 3) * 255).astype(np.uint8)
    return vis_cfg, vision, adapter, img


def _gen(tiny_cfg, tiny_models, tiny_tokenizer, extra_models, **kw):
    models = dict(tiny_models, **extra_models)
    return sdt.generate("a photo of a dog", models=models,
                        tokenizer=tiny_tokenizer, config=tiny_cfg,
                        height=16, width=16, n_inference_steps=2,
                        seed=3, return_latents=True, **kw)


def test_pipeline_ip_adapter_steers(tiny_cfg, tiny_models, tiny_tokenizer,
                                    ip_fixture):
    vis_cfg, vision, adapter, img = ip_fixture
    base_img, base_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, {})
    extra = {"ip_adapter": adapter, "clip_vision": vision}
    z_img, z_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, extra,
                        ip_adapter_image=img, ip_adapter_scale=0.0,
                        clip_vision_config=vis_cfg)
    # scale 0: the decoupled branch contributes exactly nothing
    np.testing.assert_allclose(z_lat, base_lat, rtol=1e-5, atol=1e-6)
    s_img, s_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, extra,
                        ip_adapter_image=img, ip_adapter_scale=1.0,
                        clip_vision_config=vis_cfg)
    assert np.abs(s_lat - base_lat).max() > 1e-4
    assert s_img.shape == base_img.shape


def test_pipeline_ip_requires_models(tiny_cfg, tiny_models, tiny_tokenizer,
                                     ip_fixture):
    vis_cfg, vision, _, img = ip_fixture
    with pytest.raises(ValueError, match="ip_adapter"):
        _gen(tiny_cfg, tiny_models, tiny_tokenizer,
             {"clip_vision": vision}, ip_adapter_image=img,
             clip_vision_config=vis_cfg)


# ------------------------------------------------- IP-Adapter-plus (Resampler)
def _torch_resampler(torch, dim, depth, dim_head, heads, num_queries,
                     embedding_dim, output_dim, ff_mult=4):
    """The tencent IPAdapter resampler.py module, re-stated as the oracle."""
    import math

    import torch.nn as nn

    class PerceiverAttention(nn.Module):
        def __init__(self):
            super().__init__()
            inner = dim_head * heads
            self.norm1 = nn.LayerNorm(dim)
            self.norm2 = nn.LayerNorm(dim)
            self.to_q = nn.Linear(dim, inner, bias=False)
            self.to_kv = nn.Linear(dim, inner * 2, bias=False)
            self.to_out = nn.Linear(inner, dim, bias=False)

        def forward(self, x, latents):
            x = self.norm1(x)
            latents = self.norm2(latents)
            b, l, _ = latents.shape
            q = self.to_q(latents)
            kv_input = torch.cat((x, latents), dim=-2)
            k, v = self.to_kv(kv_input).chunk(2, dim=-1)

            def rh(t):
                return t.reshape(b, t.shape[1], heads, -1).transpose(1, 2)

            q, k, v = rh(q), rh(k), rh(v)
            scale = 1 / math.sqrt(math.sqrt(dim_head))
            weight = (q * scale) @ (k * scale).transpose(-2, -1)
            weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
            out = weight @ v
            out = out.permute(0, 2, 1, 3).reshape(b, l, -1)
            return self.to_out(out)

    class Resampler(nn.Module):
        def __init__(self):
            super().__init__()
            self.latents = nn.Parameter(
                torch.randn(1, num_queries, dim) / dim**0.5)
            self.proj_in = nn.Linear(embedding_dim, dim)
            self.proj_out = nn.Linear(dim, output_dim)
            self.norm_out = nn.LayerNorm(output_dim)
            self.layers = nn.ModuleList([
                nn.ModuleList([
                    PerceiverAttention(),
                    nn.Sequential(nn.LayerNorm(dim),
                                  nn.Linear(dim, dim * ff_mult, bias=False),
                                  nn.GELU(),
                                  nn.Linear(dim * ff_mult, dim, bias=False)),
                ]) for _ in range(depth)
            ])

        def forward(self, x):
            latents = self.latents.repeat(x.size(0), 1, 1)
            x = self.proj_in(x)
            for attn, ff in self.layers:
                latents = attn(x, latents) + latents
                latents = ff(latents) + latents
            return self.norm_out(self.proj_out(latents))

    return Resampler()


def test_resampler_matches_torch_oracle(tiny_cfg):
    torch = pytest.importorskip("torch")
    torch.manual_seed(5)
    d_ctx = tiny_cfg.unet.d_context
    model = _torch_resampler(torch, dim=128, depth=2, dim_head=64, heads=2,
                             num_queries=4, embedding_dim=24,
                             output_dim=d_ctx).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = ipw._convert_resampler(sd, d_ctx)
    x = np.random.RandomState(2).randn(2, 6, 24).astype(np.float32)
    ours = np.asarray(cv.apply_resampler(params, jnp.asarray(x)))
    with torch.no_grad():
        want = model(torch.tensor(x))
    assert ours.shape == (2, 4, d_ctx)
    np.testing.assert_allclose(ours, want.numpy(), rtol=2e-4, atol=2e-5)


def _synthetic_plus_state(cfg, vis_cfg, num_queries=4, dim=64, depth=1,
                          seed=0):
    """A plus-format checkpoint: resampler image_proj + per-layer ip k/v."""
    rs = np.random.RandomState(seed)
    d_ctx = cfg.d_context
    emb = vis_cfg.width
    inner = 64  # dim_head 64 x 1 head

    def lin(o, i):
        return rs.randn(o, i).astype(np.float32) * 0.05

    proj = {"latents": rs.randn(1, num_queries, dim).astype(np.float32),
            "proj_in.weight": lin(dim, emb),
            "proj_in.bias": np.zeros(dim, np.float32),
            "proj_out.weight": lin(d_ctx, dim),
            "proj_out.bias": np.zeros(d_ctx, np.float32),
            "norm_out.weight": np.ones(d_ctx, np.float32),
            "norm_out.bias": np.zeros(d_ctx, np.float32)}
    for i in range(depth):
        proj.update({
            f"layers.{i}.0.norm1.weight": np.ones(dim, np.float32),
            f"layers.{i}.0.norm1.bias": np.zeros(dim, np.float32),
            f"layers.{i}.0.norm2.weight": np.ones(dim, np.float32),
            f"layers.{i}.0.norm2.bias": np.zeros(dim, np.float32),
            f"layers.{i}.0.to_q.weight": lin(inner, dim),
            f"layers.{i}.0.to_kv.weight": lin(inner * 2, dim),
            f"layers.{i}.0.to_out.weight": lin(dim, inner),
            f"layers.{i}.1.0.weight": np.ones(dim, np.float32),
            f"layers.{i}.1.0.bias": np.zeros(dim, np.float32),
            f"layers.{i}.1.1.weight": lin(dim * 4, dim),
            f"layers.{i}.1.3.weight": lin(dim, dim * 4),
        })
    state = _synthetic_ip_state(cfg, seed=seed + 1)
    state["image_proj"] = proj
    return state


def test_plus_converter_and_token_count(tiny_cfg):
    from pytorch_stable_diffusion_tpu.models.clip_vision import \
        tiny_vision_config

    vis_cfg = tiny_vision_config()
    params = ipw.convert_ip_adapter(
        _synthetic_plus_state(tiny_cfg.unet, vis_cfg, num_queries=5),
        tiny_cfg.unet)
    assert "latents" in params["image_proj"]
    assert ipw.num_image_tokens(params, tiny_cfg.unet) == 5
    assert len(params["image_proj"]["layers"]) == 1


def test_pipeline_ip_adapter_plus(tiny_cfg, tiny_models, tiny_tokenizer,
                                  ip_fixture):
    vis_cfg, vision, _, img = ip_fixture
    plus = ipw.convert_ip_adapter(
        _synthetic_plus_state(tiny_cfg.unet, vis_cfg, seed=7),
        tiny_cfg.unet)
    base_img, base_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, {})
    extra = {"ip_adapter": plus, "clip_vision": vision}
    s_img, s_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, extra,
                        ip_adapter_image=img, ip_adapter_scale=1.0,
                        clip_vision_config=vis_cfg)
    assert s_img.shape == base_img.shape
    assert np.abs(s_lat - base_lat).max() > 1e-4
    z_img, z_lat = _gen(tiny_cfg, tiny_models, tiny_tokenizer, extra,
                        ip_adapter_image=img, ip_adapter_scale=0.0,
                        clip_vision_config=vis_cfg)
    np.testing.assert_allclose(z_lat, base_lat, rtol=1e-5, atol=1e-6)


def test_preprocess_nonsquare_matches_transformers_processor():
    """Non-square PIL prompts follow the CLIPImageProcessor contract:
    shortest-edge bicubic resize + center crop (NOT an aspect-distorting
    square resize)."""
    PIL = pytest.importorskip("PIL.Image")
    from transformers import CLIPImageProcessor

    cfg = cv.tiny_vision_config()
    s = cfg.image_size
    rs = np.random.RandomState(3)
    img = PIL.fromarray(rs.randint(0, 256, (2 * s, 3 * s, 3), np.uint8))
    proc = CLIPImageProcessor(
        size={"shortest_edge": s}, crop_size={"height": s, "width": s},
        do_convert_rgb=True)
    want = proc(images=img, return_tensors="np").pixel_values  # (1,3,S,S)
    ours = cv.preprocess(img, cfg)
    np.testing.assert_allclose(ours, want.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_ip_adapter_sdxl_depth_layers(tiny_tokenizer):
    """SDXL-style stacked transformer blocks: every depth layer gets its
    own to_k_ip/to_v_ip (the per-layer list indexing inside
    apply_attn_block) — end-to-end through the dual-tower pipeline."""
    from pytorch_stable_diffusion_tpu.models.config import tiny_sdxl_config
    from pytorch_stable_diffusion_tpu.models import clip as clip_mod
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod
    from pytorch_stable_diffusion_tpu.models import vae as vae_mod

    cfg = tiny_sdxl_config()
    key = jax.random.PRNGKey(7)
    models = {
        "clip": clip_mod.init(jax.random.fold_in(key, 0), cfg.clip),
        "clip2": clip_mod.init(jax.random.fold_in(key, 4), cfg.clip2),
        "encoder": vae_mod.init_encoder(jax.random.fold_in(key, 1),
                                        cfg.vae),
        "decoder": vae_mod.init_decoder(jax.random.fold_in(key, 2),
                                        cfg.vae),
        "diffusion": unet_mod.init(jax.random.fold_in(key, 3), cfg.unet),
    }
    vis_cfg = cv.tiny_vision_config()
    vision = cv.init(jax.random.PRNGKey(31), vis_cfg)
    adapter = ipw.convert_ip_adapter(
        _synthetic_ip_state(cfg.unet, embed_dim=vis_cfg.proj_dim, seed=8),
        cfg.unet)
    # the plan has depth-2 entries at the attention level
    assert any(k.endswith("_1") for k in adapter["layers"])
    img = (np.random.RandomState(3).rand(
        vis_cfg.image_size, vis_cfg.image_size, 3) * 255).astype(np.uint8)
    kw = dict(models=dict(models, ip_adapter=adapter, clip_vision=vision),
              tokenizer=tiny_tokenizer, config=cfg, height=16, width=16,
              n_inference_steps=2, seed=3, return_latents=True,
              clip_vision_config=vis_cfg)
    _, base = sdt.generate("a photo of a dog",
                           models=models, tokenizer=tiny_tokenizer,
                           config=cfg, height=16, width=16,
                           n_inference_steps=2, seed=3,
                           return_latents=True)
    _, lat = sdt.generate("a photo of a dog", ip_adapter_image=img,
                          ip_adapter_scale=1.0, **kw)
    assert np.abs(lat - base).max() > 1e-4
    _, z = sdt.generate("a photo of a dog", ip_adapter_image=img,
                        ip_adapter_scale=0.0, **kw)
    np.testing.assert_allclose(z, base, rtol=1e-5, atol=1e-6)
