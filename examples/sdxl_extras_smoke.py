"""SDXL conditioning-extras hardware smoke: dual-tower textual inversion
AND dual-tower long prompts in one 1024² generation.

A 2-vector dual-tower embedding (clip_l 768 + clip_g 1280) is installed
(both token tables grow in lockstep), then a >77-token prompt containing
the trigger runs through the window-concat path (context 2x154 tokens,
pooled conditioning from window 0).  Random weights — validates compile,
determinism, and that the trigger/windows condition the output on the
real topology.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/sdxl_extras_smoke.py
"""
import time

import jax
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models.config import sdxl_config
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer
from sdxl_smoke import build_sdxl_models


def main():
    enable_compilation_cache()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = sdxl_config(policy=BF16, attention_backend=backend)
    models = build_sdxl_models(cfg)
    tok = make_test_tokenizer(["a", "photo", "of", "dog", "cat", "golden",
                              "meadow", "sunset", "in"], max_len=77)

    rng = np.random.RandomState(0)
    pair = {"clip_l": rng.randn(2, 768).astype(np.float32) * 0.01,
            "clip_g": rng.randn(2, 1280).astype(np.float32) * 0.01}
    sd = sdt.StableDiffusion(models, tok, cfg) \
        .with_textual_inversion(pair, token="<sty>")
    print("embedding installed: vocab",
          sd.config.clip.vocab_size, sd.config.clip2.vocab_size, flush=True)

    steps = 20
    long_prompt = " ".join(
        ["a photo of a golden dog in a meadow at sunset"] * 9) + " <sty>"
    t0 = time.time()
    img = sd.txt2img(long_prompt, "a cat", seed=1337, cfg_scale=7.0,
                     sampler_name="dpm++", n_inference_steps=steps,
                     height=1024, width=1024, long_prompts=True)
    print(f"sdxl 1024^2 {steps}-step long-prompt+TI: {img.shape} "
          f"range {int(img.min())}..{int(img.max())} "
          f"({time.time()-t0:.1f}s incl compile)", flush=True)
    t0 = time.time()
    img2 = sd.txt2img(long_prompt, "a cat", seed=1337, cfg_scale=7.0,
                      sampler_name="dpm++", n_inference_steps=steps,
                      height=1024, width=1024, long_prompts=True)
    print(f"repeat: {time.time()-t0:.2f}s "
          f"deterministic: {bool((img == img2).all())}", flush=True)
    # the trigger conditions the output (vs the same prompt without it)
    img3 = sd.txt2img(long_prompt.replace(" <sty>", " dog"), "a cat",
                      seed=1337, cfg_scale=7.0, sampler_name="dpm++",
                      n_inference_steps=steps, height=1024, width=1024,
                      long_prompts=True)
    print("trigger conditions output:",
          bool(np.abs(img.astype(np.int32) - img3.astype(np.int32)).max() > 0),
          flush=True)


if __name__ == "__main__":
    main()
