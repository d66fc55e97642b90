"""Capture an xprof device trace of the CFG UNet forward and print the
op-level time breakdown (top-k self-time)."""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import sd15_config

    enable_compilation_cache()
    cfg = sd15_config(policy=BF16)
    key = jax.random.PRNGKey(0)
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    hl = size // 8
    up = unet.init(jax.random.fold_in(key, 3), cfg.unet, dtype=jnp.bfloat16)
    lat = jax.random.normal(key, (2, hl, hl, 4), jnp.bfloat16)
    ctx = jax.random.normal(key, (2, 77, 768), jnp.bfloat16)

    @jax.jit
    def chained(p, l, c):
        def body(i, x):
            return unet.apply(p, x, c, 981, cfg.unet, cfg.policy,
                              attention_backend="pallas").astype(x.dtype)
        return jax.lax.fori_loop(0, 5, body, l)

    float(jnp.ravel(chained(up, lat, ctx))[0])  # compile+warm

    trace_dir = "/tmp/sdt_trace"
    with jax.profiler.trace(trace_dir):
        float(jnp.ravel(chained(up, lat, ctx))[0])

    xplanes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    print(f"trace: {xplanes[-1] if xplanes else 'NONE'}")
    if not xplanes:
        return

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data([xplanes[-1]], "framework_op_stats^",
                                       {"tqx": "out:json"})
    try:
        table = json.loads(data) if isinstance(data, (str, bytes)) else data
        rows = table["table"]["rows"]
        cols = [c["label"] for c in table["table"]["cols"]]
        i_name = cols.index("Operation") if "Operation" in cols else 1
        i_self = next(i for i, c in enumerate(cols) if "self" in c.lower()
                      and "time" in c.lower())
        items = [(r["c"][i_self]["v"], r["c"][i_name]["v"]) for r in rows]
        items.sort(reverse=True)
        print(f"{'self-time':>12}  op")
        for t, name in items[:25]:
            print(f"{t:>12}  {name[:90]}")
    except Exception as e:
        print("parse failed:", repr(e)[:200])
        out = Path("/tmp/sdt_trace_op_stats.json")
        out.write_bytes(data if isinstance(data, bytes) else str(data).encode())
        print("raw tool data saved to", out)


if __name__ == "__main__":
    main()
