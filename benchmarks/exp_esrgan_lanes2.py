"""ESRGAN follow-up: where do the 16.6 s go? (compute vs relay fetch)

Queue-11's first pass measured whole-image 512->2048 at 16.58 s warm with
fp32 output fetched through the relay tunnel (50 MB).  This run:
  * times COMPUTE ONLY (1-element fetch forces completion — the
    CLAUDE.md idiom; block_until_ready does not block on the relay),
  * times the full uint8 fetch (upscale_image now converts on device:
    12.5 MB instead of 50 MB),
  * re-runs the tile-256 lane path with the uint8 return.

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_esrgan_lanes2.py
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

ecfg = esrgan.ESRGANConfig()
params = esrgan.init(jax.random.PRNGKey(3), ecfg, dtype=jnp.bfloat16)
img = (np.random.RandomState(0).rand(512, 512, 3) * 255).astype(np.uint8)
x = jnp.asarray(img.astype(np.float32)[None] / 255.0)


@jax.jit
def run_u8(v):
    out = esrgan.apply(params, v, ecfg, BF16).astype(jnp.float32)
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)


def force_scalar(y):
    return int(jnp.ravel(y)[0])


# warm both programs
y = run_u8(x)
force_scalar(y)
np.asarray(y)

for name, fin in (("compute only (1-elem fetch)", force_scalar),
                  ("compute + full uint8 fetch (12.5 MB)",
                   lambda y: np.asarray(y).sum())):
    ts = []
    for _ in range(3):
        t0 = time.time()
        fin(run_u8(x))
        ts.append(time.time() - t0)
    print(f"{name}: best {min(ts):.2f}s all {[round(t, 2) for t in ts]}",
          flush=True)

t0 = time.time()
esrgan.upscale_image(params, img, ecfg, BF16)  # warm (compile tile path)
print(f"upscale_image whole (uint8 on device) first: {time.time()-t0:.1f}s",
      flush=True)
for _ in range(2):
    t0 = time.time()
    esrgan.upscale_image(params, img, ecfg, BF16)
    print(f"upscale_image whole warm: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
esrgan.upscale_image(params, img, ecfg, BF16, tile=256, tile_lanes=4)
print(f"tile 256 lanes 4 (uint8) first: {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.time()
    esrgan.upscale_image(params, img, ecfg, BF16, tile=256, tile_lanes=4)
    print(f"tile 256 lanes 4 (uint8) warm: {time.time()-t0:.2f}s", flush=True)
print("done", flush=True)
