"""Causal flash-attention hardware numerics check (round 3).

The causal Pallas path has no production caller (CLIP's 77 tokens
route to XLA), so VERDICT r2 weak #6 flagged it as hardware-untested
insurance.  This validates it on the chip at realistic causal shapes
(CLIP-like 77/64, GPT-ish 1024-4096) vs the XLA reference; recorded
max_err 0.0078-0.016 (bf16 output ulp scale) in RESULTS.md.
"""

import sys, time, json
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache
from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention
from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
from pytorch_stable_diffusion_tpu.core.dtypes import FP32
enable_compilation_cache()
key = jax.random.PRNGKey(0)
# realistic causal shapes: CLIP-like (12 heads, 77 tokens, dh 64) padded to
# kernel granularity, a GPT-ish 1024/2048, and a multi-chunk causal 4096
for (b,h,s,dh) in ((2,12,77,64),(2,12,1024,64),(1,16,2048,64),(1,8,4096,40)):
    q = jax.random.normal(jax.random.fold_in(key,1),(b,h,s,dh),jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key,2),(b,h,s,dh),jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key,3),(b,h,s,dh),jnp.bfloat16)
    got = flash_attention(q,k,v,causal=True)
    ref = _xla_attention(q,k,v,True,FP32)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)-ref.astype(jnp.float32))))
    print(json.dumps({"shape":[b,h,s,dh],"max_err":round(err,5)}), flush=True)
print("causal flash: hardware numerics OK", flush=True)
