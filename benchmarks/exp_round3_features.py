"""Hardware cost A/B for the round-3-late-2 feature wave (one v5e chip).

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_round3_features.py

Measures warm per-image seconds at 512x512 / 20 steps / batch 1 (bf16,
pallas) for: baseline, reference-only (+1 capture eval/step), IP-Adapter
(ViT-H vision encode once + 4 extra KV tokens/layer), ToMe 0.5,
dpm_fast, and the non-512 surfaces: MultiDiffusion 512x1536 and an
ESRGAN-4x 512->2048 upscale.  Random weights (cost is value-independent).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models import clip_vision as cv
from pytorch_stable_diffusion_tpu.models import esrgan
from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

import sys
sys.path.insert(0, "/root/repo")
from bench import build_models  # noqa: E402

enable_compilation_cache()
cfg = sdt.sd15_config(policy=BF16, attention_backend="pallas")
models = build_models(cfg)
tok = make_test_tokenizer(["a", "photo", "of", "cat", "dog"], max_len=77)
sd = sdt.StableDiffusion(models, tok, cfg)
KW = dict(seed=1, n_inference_steps=20, height=512, width=512)
ref_img = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)


def timed(name, fn, n=2):
    fn()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out).ravel()[0])  # force fetch
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts):.3f}s  {ts}", flush=True)
    return min(ts)


base = timed("baseline 512^2/20", lambda: sd.txt2img("a photo of a cat", **KW))
t = timed("reference-only", lambda: sd.txt2img(
    "a photo of a cat", reference_image=ref_img, **KW))
print(f"  reference overhead: {(t / base - 1) * 100:.1f}%", flush=True)

vis_cfg = cv.vit_h14()
vision = cv.init(jax.random.PRNGKey(2), vis_cfg, dtype=jnp.bfloat16)
from tests.test_ip_adapter import _synthetic_ip_state  # noqa: E402

ipa = ipw.convert_ip_adapter(
    _synthetic_ip_state(cfg.unet, embed_dim=vis_cfg.proj_dim), cfg.unet)
sd_ip = sd.with_ip_adapter(ipa, vision, vision_config=vis_cfg)
ipp_img = (np.random.RandomState(1).rand(224, 224, 3) * 255).astype(np.uint8)
t = timed("ip-adapter", lambda: sd_ip.txt2img(
    "a photo of a cat", ip_adapter_image=ipp_img, **KW))
print(f"  ip-adapter overhead: {(t / base - 1) * 100:.1f}%", flush=True)

t = timed("tome 0.5", lambda: sd.txt2img("a photo of a cat",
                                         tome_ratio=0.5, **KW))
print(f"  tome delta: {(t / base - 1) * 100:.1f}%", flush=True)

t = timed("dpm_fast", lambda: sd.txt2img("a photo of a cat",
                                         sampler_name="dpm_fast", **KW))
print(f"  dpm_fast vs ddpm: {(t / base - 1) * 100:.1f}%", flush=True)

timed("panorama 512x1536 (win 512, stride 256)", lambda: sd.txt2img(
    "a mountain panorama", seed=1, n_inference_steps=20, height=512,
    width=1536, panorama=True))

ecfg = esrgan.ESRGANConfig()  # full 23-block RRDBNet
eparams = esrgan.init(jax.random.PRNGKey(3), ecfg, dtype=jnp.bfloat16)
timed("esrgan 512->2048 (tiled 256)", lambda: sdt.StableDiffusion(
    models, tok, cfg).with_upscaler((eparams, ecfg)).upscale(
    ref_img, tile=256), n=1)
