"""Benchmark: SD-1.5 txt2img 512x512, 50-step DDPM with CFG, on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star (>= 1 image/sec/chip on v5e); the
reference publishes no numbers of its own (BASELINE.md).

Uses random weights (checkpoint files are not available in this environment;
FLOP count and memory traffic are weight-value independent), bf16 compute
policy, Pallas flash attention, and the fully-compiled scan pipeline.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_models(cfg, seed=0):
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    key = jax.random.PRNGKey(seed)
    dtype = cfg.policy.param_dtype
    models = {
        "clip": clip.init(jax.random.fold_in(key, 0), cfg.clip, dtype=dtype),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), cfg.vae, dtype=dtype),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), cfg.vae, dtype=dtype),
        "diffusion": unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=dtype),
    }
    if cfg.clip2 is not None:  # SDXL second tower
        models["clip2"] = clip.init(jax.random.fold_in(key, 4), cfg.clip2,
                                    dtype=dtype)
    return models


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    # batch 4 is the throughput config (north star is images/sec/chip);
    # run --batch 1 for the latency-oriented number (p50 ~1.1s/image).
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "xla"])
    ap.add_argument("--conv-backend", default="xla",
                    choices=["xla", "pallas", "fold", "pallas_fold"],
                    help="res-block GN->SiLU->conv3x3 path; pallas = the "
                         "fused halo-DMA kernel at 128-lane-aligned "
                         "channel levels (ops/pallas/conv.py); fold = XLA "
                         "convs with the GN normalize folded to a "
                         "compute-dtype (B,C) affine")
    ap.add_argument("--quant", default="none",
                    choices=["none", "wide", "conv", "w8"],
                    help="UNet int8 tier (ops/quant.py; w8 = weight-only)")
    ap.add_argument("--family", default="sd15",
                    choices=["sd15", "sd21", "sdxl", "sdxl_refiner",
                             "tiny"],
                    help="model family (driver headline stays sd15; "
                         "sdxl/refiner default their native 1024 size; "
                         "tiny is the CPU-drivable smoke config — pair "
                         "with --size 16)")
    ap.add_argument("--deepcache", type=int, default=None, metavar="N",
                    help="DeepCache interval: full UNet every N-th step, "
                         "cached-deep-feature shallow steps between")
    ap.add_argument("--sampler", default="ddpm",
                    help="any pipeline.SAMPLERS name (lcm pairs with "
                         "--steps 4 --no-cfg for the distilled-few-step "
                         "config)")
    ap.add_argument("--no-cfg", action="store_true",
                    help="single-pass UNet (no classifier-free guidance "
                         "doubling)")
    ap.add_argument("--tome", type=float, default=None, metavar="RATIO",
                    help="ToMe token merging ratio (~0.5; approximate — "
                         "merges redundant self-attention tokens)")
    ap.add_argument("--hypertile", type=int, default=None, metavar="TILE",
                    help="Hypertile tile side in latent tokens (~32; "
                         "approximate — tile-local self-attention)")
    ap.add_argument("--decode-tile", type=int, default=None, metavar="LAT",
                    help="Tiled VAE decode with this latent tile side "
                         "(exact — memory valve for >=4096^2 outputs "
                         "where the whole-image decode exceeds HBM)")
    ap.add_argument("--pag-scale", type=float, default=0.0,
                    help="Perturbed-Attention Guidance (extra cond-lane "
                         "eval per step)")
    ap.add_argument("--sag-scale", type=float, default=0.0,
                    help="Self-Attention Guidance (map capture + degraded "
                         "eval per step)")
    args = ap.parse_args()

    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models.config import (
        sd15_config, sd21_config, sdxl_config, sdxl_refiner_config,
        tiny_sd_config)
    from pytorch_stable_diffusion_tpu.pipeline import _compiled_txt2img

    enable_compilation_cache()

    backend = args.backend if jax.default_backend() == "tpu" else "xla"
    mk = {"sd15": sd15_config, "sd21": sd21_config, "sdxl": sdxl_config,
          "sdxl_refiner": sdxl_refiner_config, "tiny": tiny_sd_config}
    cfg = mk[args.family](policy=BF16, attention_backend=backend,
                          quant=args.quant,
                          conv_backend=(args.conv_backend
                                        if jax.default_backend() == "tpu"
                                        or args.family == "tiny"
                                        else "xla"))
    if args.tome:
        from pytorch_stable_diffusion_tpu.models.config import with_tome

        cfg = with_tome(cfg, args.tome)
    if args.hypertile:
        from pytorch_stable_diffusion_tpu.models.config import with_hypertile

        cfg = with_hypertile(cfg, args.hypertile)
    if args.family in ("sdxl", "sdxl_refiner") and args.size == 512 \
            and args.batch == 4:
        args.size, args.batch = 1024, 1  # native-resolution latency config
    models = build_models(cfg)

    b = args.batch
    h_lat = w_lat = args.size // cfg.vae.downsample_factor
    do_cfg = not args.no_cfg
    run = _compiled_txt2img(cfg, args.steps, do_cfg, b, h_lat, w_lat, False,
                            sampler=args.sampler, deepcache=args.deepcache,
                            decode_tile=args.decode_tile,
                            pag=args.pag_scale != 0.0,
                            sag=args.sag_scale != 0.0)

    sot = min(49406, cfg.clip.vocab_size - 2)  # tiny family: small vocab
    cond = jnp.full((b, cfg.clip.max_len), sot, jnp.int32)
    uncond = jnp.full((b, cfg.clip.max_len), sot + 1, jnp.int32)
    key = jax.random.PRNGKey(1337)
    image = jnp.zeros((b, args.size, args.size, 3), jnp.float32)
    noises = {"latent_init": jnp.zeros((1,), jnp.float32)}  # PRNG path
    if args.pag_scale:
        noises["pag_scale"] = jnp.float32(args.pag_scale)
    if args.sag_scale:
        noises["sag_scale"] = jnp.float32(args.sag_scale)
    call = lambda k: run(models, cond, uncond, k, jnp.float32(7.5),
                         jnp.int32(0), image, noises)

    def force(x):
        # axon relay: block_until_ready() does not block; a host fetch does
        return float(jnp.ravel(x)[0])

    # compile + warmup
    t0 = time.perf_counter()
    imgs, _ = call(key)
    force(imgs)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(args.iters):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        imgs, _ = call(k)
        force(imgs)
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    ips = b / p50
    result = {
        "metric": f"{args.family} txt2img {args.size}x{args.size} "
                  f"{args.steps}-step {args.sampler.upper()}"
                  f"{'+CFG' if do_cfg else ''} "
                  f"batch={b} images/sec/chip ({backend} attention, bf16"
                  + (f", quant={args.quant}" if args.quant != "none"
                     else "")
                  + (f", conv={args.conv_backend}"
                     if args.conv_backend != "xla" else "")
                  + (f", deepcache={args.deepcache}" if args.deepcache
                     else "")
                  + (f", tome={args.tome}" if args.tome else "")
                  + (f", hypertile={args.hypertile}" if args.hypertile
                     else "")
                  + (f", pag={args.pag_scale}" if args.pag_scale else "")
                  + (f", sag={args.sag_scale}" if args.sag_scale else "")
                  + (f", decode_tile={args.decode_tile}"
                     if args.decode_tile else "")
                  + ")",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 1.0, 4),
    }
    print(json.dumps(result))
    print(f"# p50 latency/image: {p50 / b:.3f}s  compile: {compile_s:.1f}s  "
          f"times: {[round(t, 3) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
