"""Reference-semantics oracle in functional torch (NCHW), for parity tests.

Re-derives the behavior of /root/reference/sd (see SURVEY.md §2) directly
from a CompVis-format state dict — deliberately written as stateless
functions over the checkpoint key namespace, NOT as a module tree, so it is
an independent consumer of the same checkpoint format our converter reads.

``quirks=True`` reproduces the reference's three bugs (SURVEY §2.2):
  * GeGLU gate dropped in the UNet FFN (sd/diffusion.py:359-363);
  * VAE attention un-transpose no-op -> channel/spatial scramble
    (sd/decoder.py:62,67);
  * beta_start typo 0.000085 (sd/ddpm.py:30; CompVis trained with 0.00085).
``quirks=False`` gives stock SD-1.5 semantics (gated GeGLU, correct
transpose) — matching our framework's default.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from pytorch_stable_diffusion_tpu.models import unet as unet_plan


def _t(sd, key):
    v = sd[key]
    return v if isinstance(v, torch.Tensor) else torch.as_tensor(np.asarray(v))


def lin(x, sd, k, bias=True):
    return F.linear(x, _t(sd, f"{k}.weight"),
                    _t(sd, f"{k}.bias") if bias else None)


def conv(x, sd, k, stride=1, pad=1):
    return F.conv2d(x, _t(sd, f"{k}.weight"), _t(sd, f"{k}.bias"),
                    stride=stride, padding=pad)


def gn(x, sd, k, groups):
    return F.group_norm(x, groups, _t(sd, f"{k}.weight"), _t(sd, f"{k}.bias"),
                        eps=1e-5)


def ln(x, sd, k):
    return F.layer_norm(x, x.shape[-1:], _t(sd, f"{k}.weight"),
                        _t(sd, f"{k}.bias"), eps=1e-5)


def sdp_attention(q, k, v, n_heads, causal):
    """Reference attention order: scores -> mask(-inf) -> /sqrt(dh) -> softmax
    (sd/attention.py:55-76)."""
    b, sq, d = q.shape
    sk = k.shape[1]
    dh = d // n_heads
    q = q.view(b, sq, n_heads, dh).transpose(1, 2)
    k = k.view(b, sk, n_heads, dh).transpose(1, 2)
    v = v.view(b, sk, n_heads, dh).transpose(1, 2)
    w = q @ k.transpose(-1, -2)
    if causal:
        mask = torch.ones_like(w, dtype=torch.bool).triu(1)
        w = w.masked_fill(mask, -torch.inf)
    w = torch.softmax(w / math.sqrt(dh), dim=-1)
    out = (w @ v).transpose(1, 2).reshape(b, sq, d)
    return out


# ------------------------------------------------------------------- CLIP
def clip_forward(sd, tokens, cfg):
    p = "cond_stage_model.transformer.text_model"
    x = _t(sd, f"{p}.embeddings.token_embedding.weight")[tokens]
    x = x + _t(sd, f"{p}.embeddings.position_embedding.weight")
    for i in range(cfg.n_layers):
        l = f"{p}.encoder.layers.{i}"
        h = ln(x, sd, f"{l}.layer_norm1")
        q = lin(h, sd, f"{l}.self_attn.q_proj")
        k = lin(h, sd, f"{l}.self_attn.k_proj")
        v = lin(h, sd, f"{l}.self_attn.v_proj")
        h = lin(sdp_attention(q, k, v, cfg.n_heads, causal=True),
                sd, f"{l}.self_attn.out_proj")
        x = x + h
        h = ln(x, sd, f"{l}.layer_norm2")
        h = lin(h, sd, f"{l}.mlp.fc1")
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU (sd/clip.py:166)
        x = x + lin(h, sd, f"{l}.mlp.fc2")
    return ln(x, sd, f"{p}.final_layer_norm")


# -------------------------------------------------------------------- VAE
def vae_res(x, sd, k, groups):
    h = conv(F.silu(gn(x, sd, f"{k}.norm1", groups)), sd, f"{k}.conv1")
    h = conv(F.silu(gn(h, sd, f"{k}.norm2", groups)), sd, f"{k}.conv2")
    if f"{k}.nin_shortcut.weight" in sd:
        x = conv(x, sd, f"{k}.nin_shortcut", pad=0)
    return x + h


def _conv1x1_as_linear(sd, k, y):
    w = _t(sd, f"{k}.weight")[:, :, 0, 0]  # (O, I)
    return F.linear(y, w, _t(sd, f"{k}.bias"))


def vae_attn_block(x, sd, k, groups, quirks):
    n, c, h, w = x.shape
    res = x
    # quirk: the reference never calls this block's GroupNorm (initialized
    # but absent from its forward) — verified by executing the reference
    y = x if quirks else gn(x, sd, f"{k}.norm", groups)
    y = y.view(n, c, h * w).transpose(-1, -2)
    q = _conv1x1_as_linear(sd, f"{k}.q", y)
    kk = _conv1x1_as_linear(sd, f"{k}.k", y)
    v = _conv1x1_as_linear(sd, f"{k}.v", y)
    y = sdp_attention(q, kk, v, n_heads=1, causal=False)
    y = _conv1x1_as_linear(sd, f"{k}.proj_out", y)
    if quirks:
        y = y.reshape(n, c, h, w)  # buggy reinterpretation (decoder.py:62,67)
    else:
        y = y.transpose(-1, -2).reshape(n, c, h, w)
    return res + y


def vae_encode(sd, img, noise, cfg, quirks):
    """img: (N,3,H,W) in [-1,1]; noise: (N,L,h,w).  sd/encoder.py:95-155."""
    g = cfg.groups
    p = "first_stage_model.encoder"
    x = conv(img, sd, f"{p}.conv_in")
    n_levels = len(cfg.ch_mults)
    for l in range(n_levels):
        x = vae_res(x, sd, f"{p}.down.{l}.block.0", g)
        x = vae_res(x, sd, f"{p}.down.{l}.block.1", g)
        if l < n_levels - 1:
            x = F.pad(x, (0, 1, 0, 1))  # asymmetric (encoder.py:118-122)
            x = conv(x, sd, f"{p}.down.{l}.downsample.conv", stride=2, pad=0)
    x = vae_res(x, sd, f"{p}.mid.block_1", g)
    x = vae_attn_block(x, sd, f"{p}.mid.attn_1", g, quirks)
    x = vae_res(x, sd, f"{p}.mid.block_2", g)
    x = conv(F.silu(gn(x, sd, f"{p}.norm_out", g)), sd, f"{p}.conv_out")
    x = conv(x, sd, "first_stage_model.quant_conv", pad=0)
    mean, log_var = x.chunk(2, dim=1)
    log_var = log_var.clamp(*cfg.logvar_clamp)
    return (mean + torch.exp(0.5 * log_var) * noise) * cfg.scale_factor


def vae_decode(sd, lat, cfg, quirks):
    """sd/decoder.py:342-374."""
    g = cfg.groups
    p = "first_stage_model.decoder"
    x = lat / cfg.scale_factor
    x = conv(x, sd, "first_stage_model.post_quant_conv", pad=0)
    x = conv(x, sd, f"{p}.conv_in")
    x = vae_res(x, sd, f"{p}.mid.block_1", g)
    x = vae_attn_block(x, sd, f"{p}.mid.attn_1", g, quirks)
    x = vae_res(x, sd, f"{p}.mid.block_2", g)
    for l in reversed(range(len(cfg.ch_mults))):
        for b in range(3):
            x = vae_res(x, sd, f"{p}.up.{l}.block.{b}", g)
        if l > 0:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, sd, f"{p}.up.{l}.upsample.conv")
    return conv(F.silu(gn(x, sd, f"{p}.norm_out", g)), sd, f"{p}.conv_out")


# ------------------------------------------------------------------- UNet
def unet_res(x, temb, sd, k, groups):
    h = conv(F.silu(gn(x, sd, f"{k}.in_layers.0", groups)), sd, f"{k}.in_layers.2")
    t = lin(F.silu(temb), sd, f"{k}.emb_layers.1")
    h = h + t[:, :, None, None]
    h = conv(F.silu(gn(h, sd, f"{k}.out_layers.0", groups)), sd, f"{k}.out_layers.3")
    if f"{k}.skip_connection.weight" in sd:
        x = conv(x, sd, f"{k}.skip_connection", pad=0)
    return x + h


def unet_spatial_transformer(x, ctx, sd, k, n_heads, groups, quirks):
    n, c, h, w = x.shape
    res_long = x
    y = gn(x, sd, f"{k}.norm", groups)
    y = conv(y, sd, f"{k}.proj_in", pad=0)
    y = y.view(n, c, h * w).transpose(-1, -2)
    tb = f"{k}.transformer_blocks.0"
    t = ln(y, sd, f"{tb}.norm1")
    q = lin(t, sd, f"{tb}.attn1.to_q", bias=False)
    kk = lin(t, sd, f"{tb}.attn1.to_k", bias=False)
    v = lin(t, sd, f"{tb}.attn1.to_v", bias=False)
    y = y + lin(sdp_attention(q, kk, v, n_heads, False), sd, f"{tb}.attn1.to_out.0")
    t = ln(y, sd, f"{tb}.norm2")
    q = lin(t, sd, f"{tb}.attn2.to_q", bias=False)
    kk = lin(ctx, sd, f"{tb}.attn2.to_k", bias=False)
    v = lin(ctx, sd, f"{tb}.attn2.to_v", bias=False)
    y = y + lin(sdp_attention(q, kk, v, n_heads, False), sd, f"{tb}.attn2.to_out.0")
    t = ln(y, sd, f"{tb}.norm3")
    t, gate = lin(t, sd, f"{tb}.ff.net.0.proj").chunk(2, dim=-1)
    if not quirks:
        t = t * F.gelu(gate)  # stock SD GeGLU; reference drops gate
    y = y + lin(t, sd, f"{tb}.ff.net.2")
    y = y.transpose(-1, -2).reshape(n, c, h, w)
    return conv(y, sd, f"{k}.proj_out", pad=0) + res_long


def time_embedding(t, dim=320):
    """[cos, sin] — cos first (sd/pipeline.py:310-349)."""
    half = dim // 2
    freqs = torch.pow(10000.0, -torch.arange(half, dtype=torch.float32) / half)
    args = torch.as_tensor([t], dtype=torch.float32)[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def unet_forward(sd, x, ctx, t, cfg, quirks):
    """x: (B, 4, h, w); ctx: (B, 77, d); sd/diffusion.py:628-676."""
    p = "model.diffusion_model"
    g = cfg.groups
    temb = lin(time_embedding(t, cfg.model_channels), sd, f"{p}.time_embed.0")
    temb = lin(F.silu(temb), sd, f"{p}.time_embed.2")

    x = conv(x, sd, f"{p}.input_blocks.0.0")
    skips = [x]
    for i, st in enumerate(unet_plan.encoder_plan(cfg)[1:]):
        blk = f"{p}.input_blocks.{i + 1}"
        if st["kind"] == "down":
            x = conv(x, sd, f"{blk}.0.op", stride=2, pad=1)
        else:
            x = unet_res(x, temb, sd, f"{blk}.0", g)
            if st["attn"]:
                x = unet_spatial_transformer(x, ctx, sd, f"{blk}.1",
                                             cfg.n_heads, g, quirks)
        skips.append(x)

    x = unet_res(x, temb, sd, f"{p}.middle_block.0", g)
    x = unet_spatial_transformer(x, ctx, sd, f"{p}.middle_block.1",
                                 cfg.n_heads, g, quirks)
    x = unet_res(x, temb, sd, f"{p}.middle_block.2", g)

    for j, st in enumerate(unet_plan.decoder_plan(cfg)):
        blk = f"{p}.output_blocks.{j}"
        x = torch.cat([x, skips.pop()], dim=1)
        x = unet_res(x, temb, sd, f"{blk}.0", g)
        nxt = 1
        if st["attn"]:
            x = unet_spatial_transformer(x, ctx, sd, f"{blk}.1",
                                         cfg.n_heads, g, quirks)
            nxt = 2
        if st["upsample"]:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = conv(x, sd, f"{blk}.{nxt}.conv")
    x = conv(F.silu(gn(x, sd, f"{p}.out.0", g)), sd, f"{p}.out.2")
    return x


# ------------------------------------------------------------- full pipeline
def ddpm_arrays(T=1000, b0=0.00085, b1=0.012):
    """b0=0.00085 is the CompVis value; the reference's own default is the
    typo 0.000085 (ref ddpm.py:30), reproduced by quirks=True below."""
    betas = np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2
    return betas, np.cumprod(1.0 - betas)


def oracle_generate(sd, cond_tokens, uncond_tokens, cfg, *, n_steps, cfg_scale,
                    latent_init, sampler_noise, quirks,
                    init_image=None, encoder_noise=None, start_step=0):
    """Full reference pipeline (sd/pipeline.py:13-262) with injected noise.

    latent_init: (B, L, h, w); sampler_noise: (steps, B, L, h, w); NCHW.
    Returns (image_float in [-1,1] approx, latents) as numpy (NCHW).
    """
    with torch.no_grad():
        ctx_c = clip_forward(sd, torch.as_tensor(cond_tokens), cfg.clip)
        ctx_u = clip_forward(sd, torch.as_tensor(uncond_tokens), cfg.clip)
        ctx = torch.cat([ctx_c, ctx_u])

        betas, acp = ddpm_arrays(b0=0.000085 if quirks else 0.00085)
        ratio = 1000 // n_steps
        timesteps = (np.arange(n_steps) * ratio).round()[::-1].astype(np.int64)

        if init_image is not None:
            lat0 = vae_encode(sd, torch.as_tensor(init_image),
                              torch.as_tensor(encoder_noise), cfg.vae, quirks)
            t0 = int(timesteps[start_step])
            a = acp[t0]
            lat = (np.sqrt(a) * lat0.numpy()
                   + np.sqrt(1 - a) * latent_init).astype(np.float32)
            lat = torch.as_tensor(lat)
        else:
            lat = torch.as_tensor(latent_init)

        for i in range(start_step, n_steps):
            t = int(timesteps[i])
            model_in = lat.repeat(2, 1, 1, 1)
            eps = unet_forward(sd, model_in, ctx, t, cfg.unet, quirks)
            eps_c, eps_u = eps.chunk(2)
            eps = cfg_scale * (eps_c - eps_u) + eps_u

            prev_t = t - ratio
            a_t = acp[t]
            a_prev = acp[prev_t] if prev_t >= 0 else 1.0
            b_t, b_prev = 1 - a_t, 1 - a_prev
            cur_a = a_t / a_prev
            x0 = (lat - math.sqrt(b_t) * eps) / math.sqrt(a_t)
            mean = (math.sqrt(a_prev) * (1 - cur_a) / b_t) * x0 \
                 + (math.sqrt(cur_a) * b_prev / b_t) * lat
            if t > 0:
                var = max(b_prev / b_t * (1 - cur_a), 1e-20)
                lat = mean + math.sqrt(var) * torch.as_tensor(sampler_noise[i])
            else:
                lat = mean
            lat = lat.float()

        img = vae_decode(sd, lat, cfg.vae, quirks)
        return img.numpy(), lat.numpy()
