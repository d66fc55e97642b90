"""Multi-chip bench: DP throughput (BASELINE.json config 5) + SP latency.

The reference is strictly single-device (SURVEY §2.3); this is the
one-command multi-chip measurement mirroring what
``examples/validate_real_weights.py`` is for real checkpoints: today (one
physical chip reachable) ``--dry-run`` rehearses the whole flow on an
n-device VIRTUAL CPU mesh — exactly the driver's ``dryrun_multichip``
environment — and on a real v5e-8 the same command without ``--dry-run``
prints images/sec/chip DP scaling and the sequence-parallel latency curve.

Usage:
  # virtual-mesh rehearsal (any host):
  PYTHONPATH=/root/repo python benchmarks/bench_multichip.py --devices 8 --dry-run
  # real multi-chip hardware:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_multichip.py --devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--dry-run", action="store_true",
                    help="rehearse on an n-device virtual CPU mesh (tiny "
                         "config, 2 steps) instead of real hardware")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch-per-chip", type=int, default=4,
                    help="DP batch per device (config 5 uses 4)")
    ap.add_argument("--iters", type=int, default=3)
    return ap.parse_args(argv)


def _reexec_dry(n: int) -> None:
    """Re-exec into a scrubbed virtual-CPU child (same env contract as the
    driver's dryrun_multichip — a wedged TPU relay must not fail this)."""
    from __graft_entry__ import _scrubbed_cpu_env

    env = _scrubbed_cpu_env(n)
    env["_SDT_BENCH_MULTICHIP_CHILD"] = "1"
    args = [a for a in sys.argv[1:] if a != "--dry-run"]
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "--dry-run"] + args,
        env=env, cwd=str(REPO))
    if proc.returncode != 0:
        raise SystemExit(proc.returncode)


def main():
    args = parse_args()
    dry_child = os.environ.get("_SDT_BENCH_MULTICHIP_CHILD")
    if args.dry_run and not dry_child:
        _reexec_dry(args.devices)
        return

    import jax

    if dry_child:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pytorch_stable_diffusion_tpu.core.cache import (
        enable_compilation_cache)
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16, FP32
    from pytorch_stable_diffusion_tpu.core.mesh import make_mesh
    from pytorch_stable_diffusion_tpu.models.config import (sd15_config,
                                                            tiny_sd_config)
    from pytorch_stable_diffusion_tpu.parallel.dp import generate_images_dp
    from pytorch_stable_diffusion_tpu.parallel.sp import generate_spatial
    from pytorch_stable_diffusion_tpu.weights.tokenizer import (
        make_test_tokenizer)
    from bench import build_models

    devices = jax.devices()
    n = args.devices
    if len(devices) < n:
        raise SystemExit(
            f"{len(devices)} device(s) visible, need {n}.  On a single-chip "
            "host run with --dry-run (virtual CPU mesh rehearsal).")

    dry = bool(dry_child)
    if dry:
        cfg = tiny_sd_config()
        size, steps, iters = 32, 2, 1
    else:
        enable_compilation_cache()
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        cfg = sd15_config(policy=BF16, attention_backend=backend)
        size, steps, iters = args.size, args.steps, args.iters
    models = build_models(cfg)
    tok = make_test_tokenizer(["a", "photo", "of", "cat", "dog"],
                              max_len=cfg.clip.max_len)
    mode = "virtual-CPU rehearsal" if dry else "hardware"
    print(f"# bench_multichip: {n} devices ({mode}), {size}^2/{steps} steps",
          flush=True)

    def timed(fn):
        fn()  # compile + warm
        ts = []
        for _ in range(max(iters, 1)):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out)  # host fetch forces completion (axon relay:
            ts.append(time.perf_counter() - t0)  # block_until_ready no-ops)
        return min(ts)

    # --- DP throughput (config 5): batch = n * batch_per_chip ------------
    bpc = 1 if dry else args.batch_per_chip
    dp_mesh = make_mesh(data=n, model=1, devices=devices[:n])
    prompts = ["a photo of a cat"] * (n * bpc)
    t = timed(lambda: generate_images_dp(
        prompts, mesh=dp_mesh, models=models, tokenizer=tok, seed=1,
        n_inference_steps=steps, config=cfg, height=size, width=size))
    ips_chip = len(prompts) / t / n
    print(json.dumps({
        "metric": f"DP txt2img {size}x{size} {steps}-step batch "
                  f"{len(prompts)} over {n} devices, images/sec/chip",
        "value": round(ips_chip, 4), "seconds": round(t, 3),
        "rehearsal": dry}), flush=True)

    # --- SP latency curve: one image, model axis 2..n ---------------------
    for m in (2, 4, 8):
        if m > n or n % m:
            continue
        sp_mesh = make_mesh(data=1, model=m, devices=devices[:m])
        t = timed(lambda: generate_spatial(
            "a photo of a cat", "", mesh=sp_mesh, models=models,
            tokenizer=tok, seed=1, n_inference_steps=steps, config=cfg,
            height=size, width=size))
        print(json.dumps({
            "metric": f"SP txt2img {size}x{size} {steps}-step latency, "
                      f"model={m}", "value": round(t, 3), "unit": "s",
            "rehearsal": dry}), flush=True)
    print("# bench_multichip: PASS", flush=True)


if __name__ == "__main__":
    main()
