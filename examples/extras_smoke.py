"""Hardware smoke for the round-3 conditioning extras at full SD-1.5 scale:
ControlNet, 9-channel inpaint, latent-blend inpaint, long prompts.

Synthetic bf16 weights (no checkpoints on this host), pallas attention,
512x512 / 20 steps.  Each config runs twice: first time includes compile,
the repeat is the steady-state number.  Run with
PYTHONPATH=/root/repo:/root/.axon_site python examples/extras_smoke.py
"""
import time

import jax
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from bench import build_models
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.models import controlnet as controlnet_mod
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

STEPS = 20
cfg = sdt.sd15_config(policy=sdt.BF16, attention_backend="pallas")
models = build_models(cfg)
tok = make_test_tokenizer(["a", "photo", "of", "dog", "cat", "golden",
                           "meadow", "sunset"], max_len=77)
rng = np.random.RandomState(0)
init = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
mask = np.zeros((512, 512), np.float32)
mask[128:384, 128:384] = 1.0


def run(label, fn):
    t0 = time.time()
    img = fn()
    cold = time.time() - t0
    t0 = time.time()
    fn()
    warm = time.time() - t0
    print(f"{label}: {img.shape} cold {cold:.1f}s warm {warm:.2f}s",
          flush=True)
    return warm


base = run("baseline txt2img 512/20", lambda: sdt.generate(
    "a photo of a golden dog", "a cat", models=models, tokenizer=tok,
    seed=1337, n_inference_steps=STEPS, config=cfg))

# ---- ControlNet (published SD-1.5 controlnet topology, ~361M params)
ctrl = controlnet_mod.init(jax.random.PRNGKey(9), cfg.unet,
                           downsample_factor=8, dtype=cfg.policy.param_dtype)
cmodels = dict(models, controlnet=ctrl)
hint = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
cn = run("controlnet txt2img 512/20", lambda: sdt.generate(
    "a photo of a golden dog", "a cat", models=cmodels, tokenizer=tok,
    seed=1337, n_inference_steps=STEPS, config=cfg, control_image=hint))
print(f"  controlnet overhead: +{(cn / base - 1) * 100:.0f}%", flush=True)

# ---- multi-ControlNet: two side nets, residuals summed
ctrl2 = controlnet_mod.init(jax.random.PRNGKey(10), cfg.unet,
                            downsample_factor=8, dtype=cfg.policy.param_dtype)
mmodels = dict(models, controlnet=[ctrl, ctrl2])
hint2 = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
mc = run("2x controlnet txt2img 512/20", lambda: sdt.generate(
    "a photo of a golden dog", "a cat", models=mmodels, tokenizer=tok,
    seed=1337, n_inference_steps=STEPS, config=cfg,
    control_image=[hint, hint2], controlnet_scale=[1.0, 0.5]))
print(f"  2x controlnet overhead: +{(mc / base - 1) * 100:.0f}%", flush=True)

# ---- latent-blend inpaint (plain checkpoint)
bl = run("blend inpaint 512/20", lambda: sdt.generate(
    "a photo of a golden dog", "a cat", models=models, tokenizer=tok,
    seed=1337, n_inference_steps=STEPS, config=cfg, input_image=init,
    mask_image=mask, strength=1.0))

# ---- 9-channel inpaint UNet family
icfg = sdt.sd15_inpaint_config(policy=sdt.BF16, attention_backend="pallas")
imodels = dict(models)
from pytorch_stable_diffusion_tpu.models import unet as unet_mod  # noqa: E402

imodels["diffusion"] = unet_mod.init(jax.random.PRNGKey(11), icfg.unet,
                                     dtype=icfg.policy.param_dtype)
u9 = run("unet9 inpaint 512/20", lambda: sdt.generate(
    "a photo of a golden dog", "a cat", models=imodels, tokenizer=tok,
    seed=1337, n_inference_steps=STEPS, config=icfg, input_image=init,
    mask_image=mask, strength=1.0))

# ---- long prompt: 2 windows -> 154-token context
long_prompt = " ".join(["a photo of a golden dog in a meadow at sunset"] * 9)
lp = run("long-prompt (2-window) 512/20", lambda: sdt.generate(
    long_prompt, "a cat", models=models, tokenizer=tok, seed=1337,
    n_inference_steps=STEPS, config=cfg, long_prompts=True))
print(f"  long-prompt overhead: +{(lp / base - 1) * 100:.0f}%", flush=True)
