"""Profile the IP-Adapter e2e anomaly (+3.5 s/call at 512^2/20-step).

exp_ip_insitu measured e2e ip 4.10 s vs base 0.61 s with NO retrace (the
CPU probe shows calls 2+ are clean cache hits), so the 3.5 s is either
device time (a pathologically lowered fusion — vision tower or the
decoupled 4-token IP attention) or host/dispatch time.  This experiment
discriminates: capture an xprof trace of one WARM call each (base, ip)
and compare the device-plane op totals against the wall clock.

  wall ~= device total  -> find the slow fusion in the op table
  wall >> device total  -> host-side (dispatch/transfer) — look at
                           transfers and gaps, not ops

Usage (TPU host):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/exp_ip_trace.py
"""

from __future__ import annotations

import glob
import os
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np


def device_op_table(trace_dir, top=20):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("  NO TRACE")
        return
    xp = xplane_pb2.XSpace()
    xp.ParseFromString(Path(xplanes[-1]).read_bytes())
    plane = next((p for p in xp.planes if p.name == "/device:TPU:0"), None)
    if plane is None:
        print("  no TPU plane; planes:", [p.name for p in xp.planes])
        return
    meta = plane.event_metadata
    line = next(ln for ln in plane.lines if ln.name == "XLA Ops")
    agg, cnt, total = defaultdict(float), defaultdict(int), 0.0
    span_lo, span_hi = float("inf"), 0.0
    for ev in line.events:
        name = meta[ev.metadata_id].name
        if name.startswith("%while"):
            continue
        d = ev.duration_ps / 1e9  # ms
        total += d
        span_lo = min(span_lo, ev.offset_ps)
        span_hi = max(span_hi, ev.offset_ps + ev.duration_ps)
        key = re.sub(r"[.\d]+$", "", name.split(" = ")[0])
        agg[key] += d
        cnt[key] += 1
    span = (span_hi - span_lo) / 1e9 if span_hi else 0.0
    print(f"  device busy {total:.1f} ms, span {span:.1f} ms")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t:9.3f} ms {100 * t / total:5.1f}% x{cnt[name]:<5} "
              f"{name[:76]}")


def main():
    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
    from pytorch_stable_diffusion_tpu.core.dtypes import BF16
    from pytorch_stable_diffusion_tpu.models import clip_vision as cv
    from pytorch_stable_diffusion_tpu.weights import ip_adapter as ipw
    from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

    from bench import build_models

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_ip_adapter import _synthetic_ip_state

    enable_compilation_cache()
    cfg = sdt.sd15_config(policy=BF16, attention_backend="pallas")
    models = build_models(cfg)
    vis_cfg = cv.vit_h14()
    import jax.numpy as jnp
    vision = cv.init(jax.random.PRNGKey(2), vis_cfg, dtype=jnp.bfloat16)
    ipa = ipw.convert_ip_adapter(
        _synthetic_ip_state(cfg.unet, embed_dim=vis_cfg.proj_dim), cfg.unet)
    tok = make_test_tokenizer(["a", "photo", "of", "cat", "dog"], max_len=77)
    sd = sdt.StableDiffusion(models, tok, cfg)
    sd_ip = sd.with_ip_adapter(ipa, vision, vision_config=vis_cfg)
    ipp_img = (np.random.RandomState(1).rand(224, 224, 3) * 255
               ).astype(np.uint8)
    KW = dict(seed=1, n_inference_steps=20, height=512, width=512)

    parts = set(sys.argv[1:]) or {"base", "ip"}

    def traced(name, fn):
        fn()  # warm (compile cached from the queue runs)
        t0 = time.perf_counter()
        out = fn()
        float(np.asarray(out).ravel()[0])
        wall = time.perf_counter() - t0
        trace_dir = f"/tmp/sdt_ip_trace_{name}"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            out = fn()
            float(np.asarray(out).ravel()[0])
        print(f"{name}: wall {wall:.3f}s", flush=True)
        device_op_table(trace_dir)

    if "base" in parts:
        traced("base", lambda: sd.txt2img("a photo of a cat", **KW))
    if "ip" in parts:
        traced("ip", lambda: sd_ip.txt2img(
            "a photo of a cat", ip_adapter_image=ipp_img, **KW))


if __name__ == "__main__":
    main()
