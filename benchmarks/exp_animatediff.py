"""AnimateDiff frames-mode hardware cost A/B (one v5e chip).

The last round-3-late feature without a measured lane cost (VERDICT r3
item 2).  Measures warm seconds/clip at 512x512 / 20 steps for
n_frames in {8, 16} against the plain batch-1 txt2img baseline, plus a
motion_window=8 sweep at n_frames=16 (the community context scheduler).
Cost model to check: an n-frame clip under CFG is a 2n-lane UNet batch
(~n x the batch-1 eval) + temporal attention over the frame axis at
every site (17 sites, seq len = n, tokens = HW per site).

Weights are synthetic at the real mm_sd_v15 temporal topology
(tests/test_animatediff._synthetic_motion_state at full SD-1.5 width) —
cost is value-independent.

Usage (TPU host, strictly serial with other benches):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_animatediff.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

import pytorch_stable_diffusion_tpu as sdt  # noqa: E402
from pytorch_stable_diffusion_tpu.core.cache import (  # noqa: E402
    enable_compilation_cache)
from pytorch_stable_diffusion_tpu.core.dtypes import BF16  # noqa: E402
from pytorch_stable_diffusion_tpu.weights import animatediff as ad  # noqa: E402
from pytorch_stable_diffusion_tpu.weights.tokenizer import (  # noqa: E402
    make_test_tokenizer)

from bench import build_models  # noqa: E402


def timed(name, fn, n=2):
    fn()  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out).ravel()[0])  # force fetch
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts):.3f}s  {[f'{t:.3f}' for t in ts]}", flush=True)
    return min(ts)


def main():
    enable_compilation_cache()
    import torch

    from tests.test_animatediff import _synthetic_motion_state

    cfg = sdt.sd15_config(policy=BF16, attention_backend="pallas")
    models = build_models(cfg)
    tok = make_test_tokenizer(["a", "photo", "of", "cat", "dog"], max_len=77)

    t0 = time.perf_counter()
    state = _synthetic_motion_state(cfg.unet, torch)
    tree, _ = ad.convert_motion_module(state, cfg.unet)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    print(f"motion tree: {n_par/1e6:.1f}M params, built in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    sd = sdt.StableDiffusion(models, tok, cfg)
    KW = dict(seed=1, n_inference_steps=20, height=512, width=512)

    base = timed("baseline txt2img 512^2/20 batch 1",
                 lambda: sd.txt2img("a photo of a cat", **KW))

    sdm = sd.with_motion((tree, 24))
    for n in (8, 16):
        t = timed(f"animate n_frames={n}",
                  lambda n=n: sdm.animate("a photo of a cat", n_frames=n,
                                          **KW))
        print(f"  {t/n:.3f}s/frame = {t/base/n:.2f}x batch-1 per frame "
              f"(2n-lane CFG batch + 17 temporal-attn sites)", flush=True)

    t = timed("animate n_frames=16 motion_window=8 stride=4",
              lambda: sdm.animate("a photo of a cat", n_frames=16,
                                  motion_window=8, motion_stride=4, **KW))
    print(f"  windowed: {t/16:.3f}s/frame", flush=True)


if __name__ == "__main__":
    main()
