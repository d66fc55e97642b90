"""Serving-path measurement: AOT artifact vs cold jit, load-to-first-image.

The deployment claim behind utils/aot.py is that a serving process should
not retrace/relower model code at start.  This measures the real numbers on
hardware for the 512^2/20-step dpm++ SD-1.5 config (and --family sdxl at
1024^2), each phase in its OWN process so nothing is warm by accident:

  export   build full-size bf16 models, jax.export the whole generation
           program (traces + lowers, no backend compile), write the
           artifact + time it.
  prime    fresh process: deserialize + compile the artifact once with
           the persistent cache ON (utils/aot.prime_pipeline) — writes
           the ``jit_call_exported`` cache entry a serving restart looks
           up.  This is the deployment-build step: ship artifact + the
           cache dir this populates (one deployment, both families).
  serve    fresh process: deserialize the artifact, init weights, time
           load -> first image.  --no-cache disables the persistent XLA
           cache (true cold backend compile of the StableHLO).
  coldjit  fresh process: the live pipeline, time first image (traces,
           lowers, compiles).  --no-cache for the true-cold comparison.

Round-5 root cause (see prime_pipeline): the live jit's cache entry is
keyed ``jit_run-*`` while the artifact call looks up
``jit_call_exported-*`` — priming through the live pipeline (round 4's
"warm cache" rows) never helped the artifact path.  Prime through the
artifact instead; serve then pays deserialize + cache load + run.

Run via the queue (strictly serial):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_aot_serving.py export
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_aot_serving.py prime
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_aot_serving.py serve
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_aot_serving.py coldjit
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARTIFACT = "/tmp/sdt_serving_{family}.bin"


def build(family, policy):
    import jax.numpy as jnp

    import pytorch_stable_diffusion_tpu as sdt
    from bench import build_models

    if family == "sdxl":
        cfg = sdt.sdxl_config(policy=policy, attention_backend="pallas")
    else:
        cfg = sdt.sd15_config(policy=policy, attention_backend="pallas")
    return cfg, build_models(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["export", "prime", "serve", "coldjit"])
    ap.add_argument("--family", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent XLA cache (true cold compile)")
    args = ap.parse_args()
    size = 1024 if args.family == "sdxl" else 512
    path = ARTIFACT.format(family=args.family)

    import jax
    import numpy as np

    if not args.no_cache:
        from pytorch_stable_diffusion_tpu.core.cache import (
            enable_compilation_cache)

        enable_compilation_cache()

    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.weights.tokenizer import (
        make_test_tokenizer)

    t_start = time.perf_counter()
    print(f"[{args.phase}] {args.family} {size}^2/{args.steps} steps, "
          f"cache={'off' if args.no_cache else 'on'}", flush=True)

    if args.phase == "export":
        from pytorch_stable_diffusion_tpu.utils import aot

        cfg, models = build(args.family, BF16)
        t0 = time.perf_counter()
        blob = aot.export_pipeline(cfg, models, n_steps=args.steps,
                                   batch=1, height=size, width=size,
                                   sampler="dpm++")
        t_exp = time.perf_counter() - t0
        with open(path, "wb") as f:
            f.write(blob)
        print(f"export (trace+lower, no compile): {t_exp:.1f}s, "
              f"{len(blob)/1e6:.1f} MB -> {path}", flush=True)
        return

    if args.phase == "prime":
        from pytorch_stable_diffusion_tpu.utils import aot

        cfg, models = build(args.family, BF16)
        with open(path, "rb") as f:
            blob = f.read()
        t0 = time.perf_counter()
        aot.prime_pipeline(blob, models)
        print(f"prime (deserialize + compile + cache write): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        return

    tok = make_test_tokenizer(["a", "photo", "of", "cat"], max_len=77)
    if args.phase == "serve":
        from pytorch_stable_diffusion_tpu.utils import aot

        t0 = time.perf_counter()
        with open(path, "rb") as f:
            loaded = aot.load_pipeline(f.read())
        t_load = time.perf_counter() - t0
        cfg, models = build(args.family, BF16)  # stands in for ckpt->HBM
        t_w = time.perf_counter() - t0 - t_load
        toks = np.asarray(tok.batch_encode(["a photo of a cat"]), np.int32)
        un = np.asarray(tok.batch_encode([""]), np.int32)
        t0 = time.perf_counter()
        img, _ = loaded(models, toks, un, jax.random.PRNGKey(1), 7.5)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        loaded(models, toks, un, jax.random.PRNGKey(2), 7.5)
        t_warm = time.perf_counter() - t0
        print(f"artifact deserialize: {t_load:.1f}s; weights: {t_w:.1f}s; "
              f"first image (XLA compile of StableHLO + run): {t_first:.1f}s;"
              f" second image: {t_warm:.2f}s; "
              f"process start -> first image: "
              f"{time.perf_counter()-t_start:.1f}s", flush=True)
        assert img.dtype == np.uint8 and img.shape[1] == size
        return

    # coldjit
    import pytorch_stable_diffusion_tpu as sdt

    cfg, models = build(args.family, BF16)
    kw = dict(models=models, tokenizer=tok, seed=1,
              n_inference_steps=args.steps, config=cfg, height=size,
              width=size, sampler_name="dpm++")
    t0 = time.perf_counter()
    img = sdt.generate("a photo of a cat", "", **kw)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    sdt.generate("a photo of a cat", "", seed=2, **{k: v for k, v in
                                                    kw.items() if k != "seed"})
    t_warm = time.perf_counter() - t0
    print(f"cold jit first image (trace+lower+compile+run): {t_first:.1f}s; "
          f"second image: {t_warm:.2f}s; process start -> first image: "
          f"{time.perf_counter()-t_start:.1f}s", flush=True)
    assert img.dtype == np.uint8 and img.shape[0] == size


if __name__ == "__main__":
    main()
