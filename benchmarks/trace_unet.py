"""Capture an xprof device trace of the CFG UNet forward and print the
op-level time breakdown (top-k self-time)."""

from __future__ import annotations

import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import (sd15_config,
                                                            sdxl_config)

    enable_compilation_cache()
    sdxl = "--sdxl" in sys.argv
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfg = (sdxl_config if sdxl else sd15_config)(policy=BF16)
    key = jax.random.PRNGKey(0)
    size = int(pos[0]) if pos else (1024 if sdxl else 512)
    b = int(pos[1]) if len(pos) > 1 else 2  # CFG batch (2x images)
    hl = size // 8
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (b, hl, hl, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (b, 77, cfg.unet.d_context), jnp.bfloat16)
    add = (jax.random.normal(key, (b, cfg.unet.add_embed_dim), jnp.bfloat16)
           if cfg.unet.add_embed_dim else None)

    R_ITERS = 5

    @jax.jit
    def chained(p, l, c):
        def body(i, x):
            return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                              attention_backend="pallas",
                              add_cond=add).astype(x.dtype)
        return jax.lax.fori_loop(0, R_ITERS, body, l)

    float(jnp.ravel(chained(up, lat, ctx))[0])  # compile+warm

    trace_dir = "/tmp/sdt_trace"
    with jax.profiler.trace(trace_dir):
        float(jnp.ravel(chained(up, lat, ctx))[0])

    xplanes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    print(f"trace: {xplanes[-1] if xplanes else 'NONE'}")
    if not xplanes:
        return

    # parse the xplane proto directly (the tensorboard_plugin_profile tool
    # chain in this image has a protobuf version mismatch); XLA-op events on
    # the device plane's "XLA Ops" line are non-overlapping, so duration is
    # self-time.  Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python.
    import os
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    import re
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = xplane_pb2.XSpace()
    xp.ParseFromString(Path(xplanes[-1]).read_bytes())
    plane = next(p for p in xp.planes if p.name == "/device:TPU:0")
    meta = plane.event_metadata
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in line.events:
        name = meta[ev.metadata_id].name
        if name.startswith("%while"):  # the fori_loop wrapper double-counts
            continue
        d = ev.duration_ps / 1e9
        total += d
        key = re.sub(r"[.\d]+$", "", name.split(" = ")[0])
        agg[key] += d
        cnt[key] += 1
    print(f"total {total:.2f} ms over {R_ITERS} chained fwds "
          f"-> {total / R_ITERS:.3f} ms/fwd; top op groups:")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t / R_ITERS:8.3f} ms/fwd {100 * t / total:5.1f}% "
              f"x{cnt[name] // R_ITERS:<4} {name[:80]}")


if __name__ == "__main__":
    main()
