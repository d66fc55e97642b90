"""AnimateDiff motion modules (Guo et al. 2023) — models/motion.py,
weights/animatediff.py, the n_frames pipeline mode.

Oracle: the published TemporalTransformer3DModel re-stated in torch
inside the test (two temporal self-attentions + GEGLU ff per block,
fixed sinusoidal PE added after the per-attention LayerNorm), weights
exported under the checkpoint naming and converted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import motion as motion_mod
from pytorch_stable_diffusion_tpu.models.config import UNetConfig
from pytorch_stable_diffusion_tpu.weights import animatediff as ad


# ------------------------------------------------------------ torch oracle
def _torch_temporal(torch, c, heads, max_len=24, n_blocks=1):
    import math

    import torch.nn as nn

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_q = nn.Linear(c, c, bias=False)
            self.to_k = nn.Linear(c, c, bias=False)
            self.to_v = nn.Linear(c, c, bias=False)
            self.to_out = nn.ModuleList([nn.Linear(c, c)])
            pe = torch.zeros(1, max_len, c)
            pos = torch.arange(max_len).unsqueeze(1).float()
            div = torch.exp(torch.arange(0, c, 2).float()
                            * (-math.log(10000.0) / c))
            pe[0, :, 0::2] = torch.sin(pos * div)
            pe[0, :, 1::2] = torch.cos(pos * div)
            self.register_buffer("pe", pe)

        def forward(self, x, f):
            d = x.shape[1]
            b = x.shape[0] // f
            # (b f) d c -> (b d) f c
            x = x.reshape(b, f, d, c).permute(0, 2, 1, 3).reshape(b * d, f, c)
            x = x + self.pe[:, :f]
            q = self.to_q(x).reshape(-1, f, heads, c // heads).transpose(1, 2)
            k = self.to_k(x).reshape(-1, f, heads, c // heads).transpose(1, 2)
            v = self.to_v(x).reshape(-1, f, heads, c // heads).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2)
                              / math.sqrt(c // heads), dim=-1) @ v
            a = a.transpose(1, 2).reshape(-1, f, c)
            a = self.to_out[0](a)
            return a.reshape(b, d, f, c).permute(0, 2, 1, 3) \
                .reshape(b * f, d, c)

    class GEGLU(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Linear(c, 8 * c)

        def forward(self, x):
            h, g = self.proj(x).chunk(2, dim=-1)
            return h * torch.nn.functional.gelu(g)

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention_blocks = nn.ModuleList([Attn(), Attn()])
            self.norms = nn.ModuleList([nn.LayerNorm(c), nn.LayerNorm(c)])
            self.ff = nn.Sequential(GEGLU(), nn.Identity(),
                                    nn.Linear(4 * c, c))
            self.ff_norm = nn.LayerNorm(c)

        def forward(self, x, f):
            for attn, n in zip(self.attention_blocks, self.norms):
                x = attn(n(x), f) + x
            return self.ff(self.ff_norm(x)) + x

    class Temporal(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm = nn.GroupNorm(32 if c % 32 == 0 else c // 4, c)
            self.proj_in = nn.Linear(c, c)
            self.transformer_blocks = nn.ModuleList(
                [Block() for _ in range(n_blocks)])
            self.proj_out = nn.Linear(c, c)

        def forward(self, x, f):  # x: (bf, c, h, w)
            bf, cc, h, w = x.shape
            residual = x
            x = self.norm(x)
            x = x.permute(0, 2, 3, 1).reshape(bf, h * w, cc)
            x = self.proj_in(x)
            for blk in self.transformer_blocks:
                x = blk(x, f)
            x = self.proj_out(x)
            x = x.reshape(bf, h, w, cc).permute(0, 3, 1, 2)
            return x + residual

    return Temporal()


def _ckpt_keys(model, prefix):
    """torch module state dict -> the published checkpoint naming."""
    out = {}
    t = prefix + ".temporal_transformer."
    for k, v in model.state_dict().items():
        arr = v.detach().numpy()
        if k.startswith("transformer_blocks."):
            parts = k.split(".")
            b = parts[1]
            if parts[2] == "attention_blocks":
                ai, rest = parts[3], ".".join(parts[4:])
                if rest == "pe":
                    key = (f"{t}transformer_blocks.{b}.attention_blocks."
                           f"{ai}.pos_encoder.pe")
                elif rest.startswith("to_out"):
                    key = (f"{t}transformer_blocks.{b}.attention_blocks."
                           f"{ai}.to_out.0.{parts[-1]}")
                else:
                    key = (f"{t}transformer_blocks.{b}.attention_blocks."
                           f"{ai}.{rest}")
            elif parts[2] == "norms":
                key = f"{t}transformer_blocks.{b}.norms.{parts[3]}.{parts[4]}"
            elif parts[2] == "ff":
                if parts[3] == "0":  # GEGLU
                    key = (f"{t}transformer_blocks.{b}.ff.net.0.proj."
                           f"{parts[-1]}")
                else:  # the closing Linear (index 2)
                    key = f"{t}transformer_blocks.{b}.ff.net.2.{parts[-1]}"
            elif parts[2] == "ff_norm":
                key = f"{t}transformer_blocks.{b}.ff_norm.{parts[3]}"
            else:
                raise AssertionError(k)
        else:
            key = t + k
        out[key] = arr
    return out


def test_motion_module_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    c, heads, f = 64, 8, 4
    model = _torch_temporal(torch, c, heads).eval()
    state = _ckpt_keys(model, "mid_block.motion_modules.0")
    tree, max_len = ad.convert_motion_module(state, UNetConfig())
    assert set(tree) == {"mid"} and max_len == 24
    x = np.random.RandomState(0).randn(2 * f, 6, 5, c).astype(np.float32)
    ours = np.asarray(motion_mod.apply_motion(tree["mid"],
                                              jnp.asarray(x), f))
    with torch.no_grad():
        want = model(torch.tensor(x).permute(0, 3, 1, 2), f) \
            .permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, rtol=3e-4, atol=3e-5)


# --------------------------------------------------------------- site plan
def test_sd15_plan_has_21_modules():
    plan = ad.motion_site_plan(UNetConfig())
    # mm_sd_v15_v2: 8 down + 12 up + 1 mid modules
    assert len(plan) == 21
    assert sum(v.startswith("enc") for v in plan.values()) == 8
    assert sum(v.startswith("dec") for v in plan.values()) == 12
    assert plan["mid_block.motion_modules.0"] == "mid"
    # level-0 down blocks sit at encoder stages 0,1; level-1 at 3,4
    assert plan["down_blocks.0.motion_modules.1"] == "enc_1"
    assert plan["down_blocks.1.motion_modules.0"] == "enc_3"
    # up levels are deepest-first, 3 per level
    assert plan["up_blocks.0.motion_modules.2"] == "dec_2"


def _synthetic_motion_state(cfg: UNetConfig, torch, seed=0, with_mid=True):
    from pytorch_stable_diffusion_tpu.models import unet as unet_mod

    torch.manual_seed(seed)
    widths = {}
    for i, st in enumerate(unet_mod.encoder_plan(cfg)[1:]):
        if st["kind"] == "block":
            widths[f"enc_{i}"] = st["c_out"]
    for i, st in enumerate(unet_mod.decoder_plan(cfg)):
        widths[f"dec_{i}"] = st["c_out"]
    widths["mid"] = cfg.level_channels[-1]
    state = {}
    for pref, site in ad.motion_site_plan(cfg).items():
        if site == "mid" and not with_mid:
            continue
        m = _torch_temporal(torch, widths[site], heads=4)
        state.update(_ckpt_keys(m, pref))
    return state


def test_converter_tiny_coverage(tiny_cfg):
    torch = pytest.importorskip("torch")
    state = _synthetic_motion_state(tiny_cfg.unet, torch)
    tree, _ = ad.convert_motion_module(state, tiny_cfg.unet)
    # tiny 2-level topology: 4 down + 6 up + 1 mid
    assert len(tree) == 11
    # v1-style checkpoint (no mid module) converts too
    tree1, _ = ad.convert_motion_module(
        _synthetic_motion_state(tiny_cfg.unet, torch, with_mid=False),
        tiny_cfg.unet)
    assert "mid" not in tree1 and len(tree1) == 10


# ---------------------------------------------------------------- pipeline
def test_animate_couples_frames(tiny_cfg, tiny_models, tiny_tokenizer):
    torch = pytest.importorskip("torch")
    tree, _ = ad.convert_motion_module(
        _synthetic_motion_state(tiny_cfg.unet, torch, seed=3),
        tiny_cfg.unet)
    sd = sdt.StableDiffusion(dict(tiny_models), tiny_tokenizer, tiny_cfg) \
        .with_motion((tree, 24))
    frames = sd.animate("a photo of a dog", n_frames=4, seed=3,
                        n_inference_steps=2, height=16, width=16)
    assert frames.shape == (4, 16, 16, 3) and frames.dtype == np.uint8
    # frames carry distinct per-frame noise
    assert not np.array_equal(frames[0], frames[1])
    # temporal coupling: WITHOUT motion the same 4-lane batch equals 4
    # independent samples; with motion each frame must differ from it
    plain = sdt.generate_images(["a photo of a dog"] * 4,
                                models=tiny_models,
                                tokenizer=tiny_tokenizer, config=tiny_cfg,
                                seed=3, n_inference_steps=2, height=16,
                                width=16)
    assert np.abs(frames.astype(int) - plain.astype(int)).max() > 2
    # deterministic
    frames2 = sd.animate("a photo of a dog", n_frames=4, seed=3,
                         n_inference_steps=2, height=16, width=16)
    np.testing.assert_array_equal(frames, frames2)


def test_animate_validation(tiny_cfg, tiny_models, tiny_tokenizer):
    sd = sdt.StableDiffusion(dict(tiny_models), tiny_tokenizer, tiny_cfg)
    with pytest.raises(ValueError, match="motion"):
        sd.animate("a dog", n_frames=4)
    with pytest.raises(ValueError, match="motion"):
        sdt.generate("a dog", models=tiny_models, tokenizer=tiny_tokenizer,
                     config=tiny_cfg, height=16, width=16,
                     n_inference_steps=2, n_frames=4)


def test_animate_long_clip_windows(tiny_cfg, tiny_models, tiny_tokenizer):
    """Clips beyond the trained temporal window sweep overlapping frame
    windows (temporal MultiDiffusion): runs, deterministic, coupled."""
    torch = pytest.importorskip("torch")
    tree, _ = ad.convert_motion_module(
        _synthetic_motion_state(tiny_cfg.unet, torch, seed=4),
        tiny_cfg.unet)
    # trained window 4 -> animate auto-windows a 6-frame clip
    sd = sdt.StableDiffusion(dict(tiny_models), tiny_tokenizer, tiny_cfg) \
        .with_motion((tree, 4))
    frames = sd.animate("a photo of a dog", n_frames=6, seed=3,
                        n_inference_steps=2, height=16, width=16)
    assert frames.shape == (6, 16, 16, 3)
    assert not np.array_equal(frames[0], frames[5])
    frames2 = sd.animate("a photo of a dog", n_frames=6, seed=3,
                         n_inference_steps=2, height=16, width=16)
    np.testing.assert_array_equal(frames, frames2)
    # explicit window/stride through the pipeline kwarg
    frames3 = sd.animate("a photo of a dog", n_frames=6, seed=3,
                         n_inference_steps=2, height=16, width=16,
                         motion_window=4, motion_stride=1)
    assert frames3.shape == (6, 16, 16, 3)
    assert not np.array_equal(frames3, frames)  # denser window overlap
    with pytest.raises(ValueError, match="motion_window"):
        sdt.generate("a dog", models=dict(tiny_models, motion=tree),
                     tokenizer=tiny_tokenizer, config=tiny_cfg, height=16,
                     width=16, n_inference_steps=2, motion_window=4)
