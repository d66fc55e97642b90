"""Localize the IP-Adapter +275.6% lane cost (exp_round3_features.py).

The cost model says +50%-ish: one ViT-H encode per generation (cond +
uncond) plus 16 decoupled 4-token cross-attentions per UNet eval.  The
measured e2e overhead was ~4.5x that, so one of the components must be
structurally wrong (retrace, unhoisted vision tower, fusion breakage, or a
Mosaic VMEM cliff on an unrelated kernel).  This experiment times each
component on hardware, chained to bury the ~30 ms fetch baseline:

  1. UNet CFG forward (batch 2) x R, ip=None
  2. UNet CFG forward (batch 2) x R, ip=(layers, 4 tokens, scale)
  3. ViT-H/14 encode + ImageProjModel (cond + uncond), chained
  4. whole txt2img 512^2/20 with and without ip_adapter_image

Check: 20*(2 - 1) + 3 should explain (4.ip - 4.base).

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_ip_insitu.py \
        [steps] [vision] [e2e]     # default: all parts
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import pytorch_stable_diffusion_tpu as sdt
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models import clip_vision as cv
from pytorch_stable_diffusion_tpu.models import unet
from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

from bench import build_models  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from test_ip_adapter import _synthetic_ip_state  # noqa: E402

R = 50


def fetch(x):
    return float(jnp.ravel(x)[0])


def bench(fn, *args, iters=3):
    fetch(fn(*args))  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(parts):
    enable_compilation_cache()
    cfg = sdt.sd15_config(policy=BF16, attention_backend="pallas")
    models = build_models(cfg)
    key = jax.random.PRNGKey(0)

    fetch_ms = bench(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128))) * 1e3
    print(f"fetch baseline: {fetch_ms:.2f} ms", flush=True)

    vis_cfg = cv.vit_h14()
    vision = cv.init(jax.random.PRNGKey(2), vis_cfg, dtype=jnp.bfloat16)
    ipa = ipw.convert_ip_adapter(
        _synthetic_ip_state(cfg.unet, embed_dim=vis_cfg.proj_dim), cfg.unet)

    # --- 1/2. UNet CFG forward x R, ip off/on ---
    t_base = t_ip = float("nan")
    lat = jax.random.normal(key, (2, 64, 64, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)
    ip_tokens = jax.random.normal(key, (2, 4, cfg.unet.d_context),
                                  jnp.bfloat16)
    scale = jnp.float32(1.0)

    if "steps" in parts:
      def chained(use_ip):
        @jax.jit
        def run(p, l, c, toks, s):
            ip = (ipa["layers"], toks, s) if use_ip else None
            def body(i, x):
                return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                                  attention_backend="pallas",
                                  ip=ip).astype(x.dtype)
            return jax.lax.fori_loop(0, R, body, l)
        return run

      # CONTRIBUTING bench contract: chain >= 50 iters AND subtract the
      # fetch round-trip before dividing
      t_base = max(bench(chained(False), models["diffusion"], lat, ctx,
                         ip_tokens, scale) - fetch_ms / 1e3, 0.0) / R
      t_ip = max(bench(chained(True), models["diffusion"], lat, ctx,
                       ip_tokens, scale) - fetch_ms / 1e3, 0.0) / R
      print(f"UNet CFG fwd/step: base {t_base*1e3:.2f} ms, "
            f"ip {t_ip*1e3:.2f} ms  (+{(t_ip/t_base-1)*100:.1f}%)", flush=True)

    # --- 3. vision encode + projection (cond + uncond), single eval ---
    # (once-per-generation cost; fetch baseline subtracted, so +-5 ms)
    # cond+uncond ride as ONE batch-2 tower call: two separate calls would
    # instantiate the 32-layer tower twice in the jitted graph and double
    # the (relay-fragile) compile.
    t_vis = float("nan")
    if "vision" in parts:
        px = jnp.asarray(
            np.random.RandomState(1).rand(1, vis_cfg.image_size,
                                          vis_cfg.image_size, 3),
            jnp.bfloat16)

        @jax.jit
        def vision_both(p):
            pair = jnp.concatenate([p, jnp.zeros_like(p)], axis=0)
            emb = cv.apply_projected(vision, pair, vis_cfg, cfg.policy)
            return cv.project_image_tokens(
                ipa["image_proj"], emb, cfg.unet.d_context, cfg.policy
            ).mean()

        t_vis = max(bench(vision_both, px) - fetch_ms / 1e3, 0.0)
        print(f"ViT-H encode+project (cond+uncond): {t_vis*1e3:.2f} ms",
              flush=True)

    # --- 4. whole generate +- ip ---
    if "e2e" not in parts:
        return
    tok = make_test_tokenizer(["a", "photo", "of", "cat", "dog"], max_len=77)
    sd = sdt.StableDiffusion(models, tok, cfg)
    sd_ip = sd.with_ip_adapter(ipa, vision, vision_config=vis_cfg)
    ipp_img = (np.random.RandomState(1).rand(224, 224, 3) * 255
               ).astype(np.uint8)
    KW = dict(seed=1, n_inference_steps=20, height=512, width=512)

    def timed(name, fn, n=2):
        fn()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            float(np.asarray(out).ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts):.3f}s  {ts}", flush=True)
        return min(ts)

    e2e_base = timed("e2e base", lambda: sd.txt2img("a photo of a cat", **KW))
    e2e_ip = timed("e2e ip", lambda: sd_ip.txt2img(
        "a photo of a cat", ip_adapter_image=ipp_img, **KW))

    if np.isnan(t_base) or np.isnan(t_vis):
        # parts ran as separate invocations (the ab_queue scripts do this
        # to survive relay drops): the decomposition needs all three in
        # one process — say so instead of printing NaNs
        print("\ne2e delta {:.3f}s; component decomposition skipped "
              "(run with all of steps+vision+e2e in ONE invocation)"
              .format(e2e_ip - e2e_base), flush=True)
        return
    step_delta = 20 * (t_ip - t_base)
    explained = step_delta + t_vis
    print(f"\ne2e delta {e2e_ip-e2e_base:.3f}s; explained by components: "
          f"20*step {step_delta:.3f}s + vision {t_vis:.3f}s = "
          f"{explained:.3f}s", flush=True)


if __name__ == "__main__":
    sel = set(sys.argv[1:]) or {"steps", "vision", "e2e"}
    main(sel)
