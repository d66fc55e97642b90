"""Smoke drive: every public API surface through the package boundary (CPU-runnable).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/smoke_drive.py
"""
import json, numpy as np, jax
import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.models import clip, vae, unet
from pytorch_stable_diffusion_tpu.weights import save, diffusers
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer
import tempfile, os

cfg = sdt.tiny_sd_config()
key = jax.random.PRNGKey(0)
models = {
    "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
    "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
    "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
    "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
}
tok = make_test_tokenizer(["a", "cat", "dog"], max_len=cfg.clip.max_len)

sd = sdt.StableDiffusion(models, tok, cfg)
img = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16, width=16)
print("wrapper txt2img:", img.shape, flush=True)
img_ddim = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16, width=16,
                      sampler_name="ddim")
print("wrapper ddim:", img_ddim.shape, "differs from ddpm:", bool((img_ddim != img).any()), flush=True)

# diffusers directory load through public API
d = tempfile.mkdtemp()
from safetensors.numpy import save_file
u_sd, v_sd, t_sd = diffusers.deconvert_diffusers(models, cfg)
for sub, s_, f in (("unet", u_sd, "diffusion_pytorch_model.safetensors"),
                   ("vae", v_sd, "diffusion_pytorch_model.safetensors"),
                   ("text_encoder", t_sd, "model.safetensors")):
    os.makedirs(f"{d}/{sub}")
    save_file({k: np.ascontiguousarray(x) for k, x in s_.items()}, f"{d}/{sub}/{f}")
m2 = sdt.load_diffusers_models(d, cfg)
img2 = sdt.generate("a cat", models=m2, tokenizer=tok, seed=1,
                    n_inference_steps=2, config=cfg, height=16, width=16)
print("diffusers-loaded generate == original:", bool((img2 == img).all()), flush=True)

# probe: mixed-up diffusers dirs -> clear error
try:
    sdt.load_diffusers_models("/nonexistent", cfg)
    print("missing-dir probe: NO ERROR (bad)")
except FileNotFoundError as e:
    print("missing-dir probe ->", str(e)[:60], flush=True)

# round-3-late additions: variation seeds + PAG through the wrapper
img_v = sd.txt2img("a cat", seed=1, variation_seed=2, variation_strength=0.5,
                   n_inference_steps=2, height=16, width=16)
print("variation txt2img:", img_v.shape, "differs:", bool((img_v != img).any()),
      flush=True)
img_pag = sd.txt2img("a cat", seed=1, pag_scale=2.0,
                     n_inference_steps=2, height=16, width=16)
print("pag txt2img:", img_pag.shape, "differs:", bool((img_pag != img).any()),
      flush=True)
img_i2i = sd.img2img("a cat", img, strength=0.8, seed=1,
                     n_inference_steps=2, height=16, width=16,
                     encode_tile=4)
print("tiled-encode img2img:", img_i2i.shape, flush=True)
img_exp = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=16, timestep_spacing="exponential",
                     sampler_name="dpm++")
print("exponential-spacing txt2img:", img_exp.shape, flush=True)
img_ays = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=16, timestep_spacing="ays", sampler_name="dpm++")
print("ays-spacing txt2img:", img_ays.shape, "differs:",
      bool((img_ays != img_exp).any()), flush=True)
_m = np.zeros((32, 32), np.float32); _m[8:16, 8:16] = 1.0
_src = np.zeros((32, 32, 3), np.uint8)
img_fr = sd.inpaint("a cat", _src, _m, full_res=True, full_res_padding=4,
                    height=16, width=16, n_inference_steps=2, seed=1)
print("full-res inpaint:", img_fr.shape, "outside kept:",
      bool((img_fr[:2] == _src[:2]).all()), flush=True)
# hypernetwork through the wrapper (synthetic in-memory net)
_hn_tree = {str(cfg.unet.d_context): {
    "k": [{"kernel": np.eye(cfg.unet.d_context, dtype=np.float32) * 0.01,
           "bias": np.zeros(cfg.unet.d_context, np.float32)}],
    "v": [{"kernel": np.eye(cfg.unet.d_context, dtype=np.float32) * -0.01,
           "bias": np.zeros(cfg.unet.d_context, np.float32)}]}}
sd_hn = sd.with_hypernetwork((_hn_tree, ("linear", False)), strength=1.0)
img_hn = sd_hn.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                       width=16)
print("hypernetwork txt2img:", img_hn.shape, "differs:",
      bool((img_hn != img).any()), flush=True)
for _s in ("lms", "dpm2_a", "dpm++_2s_a", "dpm_fast", "dpm_adaptive"):
    img_s = sd.txt2img("a cat", seed=1, n_inference_steps=3, height=16,
                       width=16, sampler_name=_s)
    print(f"{_s} txt2img:", img_s.shape, flush=True)
# T2I-Adapter (fresh weights; features computed once per generation)
from pytorch_stable_diffusion_tpu.models import t2i_adapter as _t2i
import jax as _jax
_ad = _t2i.init(_jax.random.PRNGKey(7), cfg.unet,
                downsample_factor=cfg.vae.downsample_factor)
_hint = np.random.RandomState(3).randint(0, 256, (16, 16, 3)).astype(
    np.float32)
img_ad = sd.with_t2i_adapter(_ad).txt2img(
    "a cat", seed=1, n_inference_steps=2, height=16, width=16,
    adapter_image=_hint)
# InstructPix2Pix (8-channel UNet, dual text/image guidance)
import dataclasses as _dc
from pytorch_stable_diffusion_tpu.models import unet as _unet_mod
_ip_cfg = _dc.replace(cfg, unet=_dc.replace(cfg.unet, in_channels=8))
_ip_models = dict(models, diffusion=_unet_mod.init(_jax.random.PRNGKey(8),
                                                   _ip_cfg.unet))
img_ip = sdt.StableDiffusion(_ip_models, tok, _ip_cfg).edit(
    "a cat", _hint, image_guidance_scale=1.2, seed=1,
    n_inference_steps=2, height=16, width=16)
print("instruct-pix2pix edit:", img_ip.shape, flush=True)
print("t2i-adapter txt2img:", img_ad.shape, "differs:",
      bool((img_ad != img).any()), flush=True)
img_sag = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=16, sag_scale=0.75)
print("sag txt2img:", img_sag.shape, "differs:", bool((img_sag != img).any()),
      flush=True)
img_brk = sd.txt2img("a cat BREAK dog", seed=1, n_inference_steps=2,
                     height=16, width=16, long_prompts=True)
print("BREAK long-prompt txt2img:", img_brk.shape, flush=True)
sd_m = sd.merged_with(jax.tree_util.tree_map(lambda x: x * 0.9, models),
                      alpha=0.5)
img_m = sd_m.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=16)
print("merged-checkpoint txt2img:", img_m.shape, "differs:",
      bool((img_m != img).any()), flush=True)
img_up = sd.sd_upscale("a cat", img, scale=2.0, strength=0.4, overlap=8,
                       height=16, width=16, n_inference_steps=2, seed=1)
print("sd-upscale:", img_up.shape, flush=True)
img_and = sd.txt2img("a cat AND dog:0.8", "a", seed=1, n_inference_steps=2,
                     height=16, width=16)
print("composable AND txt2img:", img_and.shape, "differs:",
      bool((img_and != img).any()), flush=True)
img_tile = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                      width=16, tiling=True)
print("tiling txt2img:", img_tile.shape, "differs:",
      bool((img_tile != img).any()), flush=True)
img_out = sd.outpaint("a cat", np.zeros((14, 14, 3), np.uint8), pixels=2,
                      directions=("right", "down"), n_inference_steps=2,
                      seed=1)
print("outpaint:", img_out.shape, flush=True)
img_rst = sd.txt2img("a cat", seed=1, n_inference_steps=20, height=16,
                     width=16, sampler_name="restart")
print("restart txt2img:", img_rst.shape, flush=True)
img_dt = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                    width=16, dynamic_threshold=0.9)
print("dynamic-threshold txt2img:", img_dt.shape, "differs:",
      bool((img_dt != img).any()), flush=True)
_ref = np.full((16, 16, 3), 120, np.uint8)
img_cc = sd.img2img("a cat", _ref, strength=0.9, seed=1,
                    n_inference_steps=2, height=16, width=16,
                    color_correction=True)
print("color-correction img2img:", img_cc.shape, flush=True)
img_3m = sd.txt2img("a cat", seed=1, n_inference_steps=4, height=16,
                    width=16, sampler_name="dpm++_3m_sde")
print("dpm++_3m_sde txt2img:", img_3m.shape, flush=True)
# IP-Adapter (synthetic weights; decoupled image-token cross-attention)
from pytorch_stable_diffusion_tpu.models import clip_vision as _cv
from pytorch_stable_diffusion_tpu.weights import ip_adapter as _ipw
from tests.test_ip_adapter import _synthetic_ip_state
_vis_cfg = _cv.tiny_vision_config()
_vision = _cv.init(_jax.random.PRNGKey(9), _vis_cfg)
_ipa = _ipw.convert_ip_adapter(
    _synthetic_ip_state(cfg.unet, embed_dim=_vis_cfg.proj_dim, seed=4),
    cfg.unet)
_ipimg = np.random.RandomState(5).randint(
    0, 256, (_vis_cfg.image_size, _vis_cfg.image_size, 3)).astype(np.uint8)
img_ipa = sd.with_ip_adapter(_ipa, _vision, vision_config=_vis_cfg).txt2img(
    "a cat", seed=1, n_inference_steps=2, height=16, width=16,
    ip_adapter_image=_ipimg, ip_adapter_scale=0.8)
print("ip-adapter txt2img:", img_ipa.shape, "differs:",
      bool((img_ipa != img).any()), flush=True)
# ToMe token merging (approximate; threshold dropped so the tiny 64-token
# grid merges)
from pytorch_stable_diffusion_tpu.models.config import with_tome as _wt
img_tm = sdt.StableDiffusion(models, tok, _wt(cfg, 0.5, min_tokens=16)) \
    .txt2img("a cat", seed=1, n_inference_steps=2, height=16, width=16)
print("tome txt2img:", img_tm.shape, "differs:", bool((img_tm != img).any()),
      flush=True)
# reference-only guidance (capture/read self-attention banking)
img_ref = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=16, reference_image=_ipimg,
                     reference_fidelity=0.5)
print("reference-only txt2img:", img_ref.shape, "differs:",
      bool((img_ref != img).any()), flush=True)
# reference_adain+attn (feature-stat AdaIN banking on top of attention)
img_ra = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                    width=16, reference_image=_ipimg,
                    reference_fidelity=0.5, reference_mode="adain+attn")
print("reference adain+attn txt2img:", img_ra.shape, "differs:",
      bool((img_ra != img_ref).any()), flush=True)
# Hypertile (tile-local self-attention)
from pytorch_stable_diffusion_tpu.models.config import with_hypertile as _wh
img_ht = sdt.StableDiffusion(models, tok, _wh(cfg, 2, min_tokens=16)) \
    .txt2img("a cat", seed=1, n_inference_steps=2, height=16, width=16)
print("hypertile txt2img:", img_ht.shape, "differs:",
      bool((img_ht != img).any()), flush=True)
# MultiDiffusion panorama (wide canvas, overlapping windows)
img_pan = sd.txt2img("a cat", seed=1, n_inference_steps=2, height=16,
                     width=32, panorama=True, panorama_window=16,
                     panorama_stride=8)
print("panorama txt2img:", img_pan.shape, flush=True)
# ESRGAN upscaler (tiny random weights) + esrgan hires-fix mode
from pytorch_stable_diffusion_tpu.models import esrgan as _esr
_ecfg = _esr.tiny_esrgan_config()
_epar = _esr.init(_jax.random.PRNGKey(12), _ecfg)
sd_up2 = sd.with_upscaler((_epar, _ecfg))
img_esr = sd_up2.upscale(img[:8, :8])
print("esrgan upscale:", img_esr.shape, flush=True)
img_hf = sd_up2.hires_fix("a cat", height=32, width=32, base_height=16,
                          base_width=16, strength=0.6,
                          upscale_method="esrgan", seed=1,
                          n_inference_steps=2)
print("esrgan hires-fix:", img_hf.shape, flush=True)
# regional prompting (Latent Couple masks on AND lanes)
_ml = np.zeros((16, 16), np.float32); _ml[:, :8] = 1.0
img_reg = sd.txt2img("a cat AND dog", "a", seed=1, n_inference_steps=2,
                     height=16, width=16, region_masks=[_ml, 1.0 - _ml])
print("regional txt2img:", img_reg.shape, "differs:",
      bool((img_reg != img_and).any()), flush=True)
# AnimateDiff (synthetic motion modules; frame-coupled denoising)
try:
    import torch as _torch
    from tests.test_animatediff import _synthetic_motion_state
    from pytorch_stable_diffusion_tpu.weights import animatediff as _ad
    _mt, _ = _ad.convert_motion_module(
        _synthetic_motion_state(cfg.unet, _torch, seed=3), cfg.unet)
    frames = sd.with_motion((_mt, 24)).animate(
        "a cat", n_frames=3, seed=1, n_inference_steps=2, height=16,
        width=16)
    print("animatediff frames:", frames.shape, flush=True)
except ImportError:
    print("animatediff skipped (no torch)", flush=True)
