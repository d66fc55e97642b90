"""ESRGAN 4x 512->2048 upscale: lane-batched tiles vs whole-image (v5e).

Round-4 measured the sequential per-tile host loop at 43.4 s (tile 256;
RESULTS.md feature-lane table).  Round 5 lane-batches same-shape tiles
through one jitted apply with async chunk dispatch
(models/esrgan.py::upscale_image).  This measures warm seconds for the
whole-image path and tile 256 / tile 128 at tile_lanes 4/8/16.

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_esrgan_lanes.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.core.dtypes import BF16
from pytorch_stable_diffusion_tpu.models import esrgan

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)

ecfg = esrgan.ESRGANConfig()  # full 23-block RRDBNet
params = esrgan.init(jax.random.PRNGKey(3), ecfg, dtype=jnp.bfloat16)
img = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)


def timed(name, fn, n=2):
    t0 = time.time()
    fn()  # warm (compile)
    warmup = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name}: warm {best:.2f}s (first {warmup:.1f}s, "
          f"all {[round(t, 2) for t in ts]})", flush=True)
    return best


timed("whole 512->2048 (no tile)",
      lambda: esrgan.upscale_image(params, img, ecfg, BF16))
for tile in (256, 128):
    for lanes in (4, 8, 16):
        n_tiles = ((512 + tile - 1) // tile) ** 2
        if lanes > n_tiles:
            continue
        timed(f"tile {tile} ({n_tiles} tiles), lanes {lanes}",
              lambda t=tile, l=lanes: esrgan.upscale_image(
                  params, img, ecfg, BF16, tile=t, tile_lanes=l))
print("done", flush=True)
