"""Minimal serving loop from an AOT artifact — the deployment pattern.

Production serving should not pay the cold compile (8-15 min full-scale,
CLAUDE.md) at process start.  The pattern this example demonstrates:

  1. OFFLINE (once per serving config): ``utils.aot.export_pipeline`` —
     lower the whole generation program to a portable StableHLO artifact.
  2. AT PROCESS START: deserialize the artifact (seconds, no model code
     retraced) and load the checkpoint into HBM once.
  3. PER REQUEST: tokenize, one device call, PNG out.  Weights are a
     call-time argument, so one artifact serves any same-architecture
     checkpoint (fine-tunes, LoRA merges).

Usage:
  # offline export (writes artifact.bin next to the checkpoint)
  python examples/aot_serve.py --ckpt sd15.safetensors --vocab vocab.json \
      --merges merges.txt --export artifact.bin --steps 30

  # serve: one prompt per stdin line, PNGs written to --outdir
  python examples/aot_serve.py --ckpt sd15.safetensors --vocab vocab.json \
      --merges merges.txt --artifact artifact.bin --outdir out/ < prompts.txt

  # self-test without weights (tiny config, CPU): export + 2 requests
  python examples/aot_serve.py --selftest
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt"), ap.add_argument("--vocab"), ap.add_argument("--merges")
    ap.add_argument("--artifact", help="serialized artifact to serve from")
    ap.add_argument("--export", help="write a fresh artifact here and exit")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--sampler", default="dpm++")
    ap.add_argument("--cfg-scale", type=float, default=7.5)
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--selftest", action="store_true",
                    help="tiny-config end-to-end check, no weight files")
    args = ap.parse_args()

    import jax
    import numpy as np

    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.utils import aot

    enable_compilation_cache()

    if args.selftest:
        from pytorch_stable_diffusion_tpu.models import clip, unet, vae
        from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config
        from pytorch_stable_diffusion_tpu.weights.tokenizer import \
            make_test_tokenizer

        cfg = tiny_sd_config()
        key = jax.random.PRNGKey(0)
        models = {
            "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip),
            "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae),
            "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae),
            "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet),
        }
        tok = make_test_tokenizer(["a", "cat", "dog"],
                                  max_len=cfg.clip.max_len)
        blob = aot.export_pipeline(cfg, models, n_steps=2, batch=1,
                                   height=16, width=16, sampler=args.sampler)
        served = aot.load_pipeline(blob)
        print(f"[selftest] artifact {len(blob)/1e3:.0f} kB "
              f"platforms={served.platforms}", flush=True)
        for i, prompt in enumerate(["a cat", "a dog"]):
            ids = np.asarray([tok.encode(prompt)])
            un = np.asarray([tok.encode("")])
            t0 = time.time()
            imgs, _ = served(models, ids, un, jax.random.PRNGKey(i), 7.5)
            print(f"[selftest] request {i}: {imgs.shape} "
                  f"{time.time()-t0:.2f}s finite={np.isfinite(imgs).all()}",
                  flush=True)
        print("[selftest] ok", flush=True)
        return 0

    if not (args.ckpt and args.vocab and args.merges):
        ap.error("--ckpt/--vocab/--merges required (or --selftest)")
    from pytorch_stable_diffusion_tpu import StableDiffusion
    from pytorch_stable_diffusion_tpu.models.config import sd15_config
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16

    backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = sd15_config(policy=BF16, attention_backend=backend)
    t0 = time.time()
    sd = StableDiffusion.from_checkpoint(args.ckpt, args.vocab, args.merges,
                                         config=cfg)
    print(f"[serve] weights -> HBM in {time.time()-t0:.1f}s", flush=True)

    if args.export:
        blob = aot.export_pipeline(cfg, sd.models, n_steps=args.steps,
                                   batch=1, height=args.size,
                                   width=args.size, sampler=args.sampler)
        with open(args.export, "wb") as f:
            f.write(blob)
        print(f"[serve] exported {len(blob)/1e6:.1f} MB -> {args.export}",
              flush=True)
        return 0

    if not args.artifact:
        ap.error("--artifact (or --export) required")
    t0 = time.time()
    with open(args.artifact, "rb") as f:
        served = aot.load_pipeline(f.read())
    print(f"[serve] artifact loaded in {time.time()-t0:.1f}s "
          f"(platforms={served.platforms}); reading prompts from stdin",
          flush=True)

    from PIL import Image

    tok = sd.tokenizer
    for i, line in enumerate(sys.stdin):
        prompt = line.strip()
        if not prompt:
            continue
        ids = np.asarray([tok.encode(prompt)])
        un = np.asarray([tok.encode("")])
        t0 = time.time()
        imgs, _ = served(sd.models, ids, un, jax.random.PRNGKey(i),
                         args.cfg_scale)
        path = f"{args.outdir}/serve_{i:04d}.png"
        Image.fromarray(imgs[0]).save(path)
        print(f"[serve] {time.time()-t0:.2f}s {path!r} <- {prompt!r}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
