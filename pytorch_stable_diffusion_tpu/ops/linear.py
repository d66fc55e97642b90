"""Dense layer (functional).

Kernel layout is (in, out) — JAX convention, so ``apply`` is a plain
``x @ W`` that XLA maps straight onto the MXU.  The CompVis/torch layout
(out, in) is transposed at conversion time (weights/convert.py), not here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32


def init(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / (d_in**0.5)
    p = {"kernel": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def apply(params, x, policy: Policy = FP32, quant: str = "none"):
    """``quant``: dynamic w8a8 path when the contraction K is wide enough
    (ops/quant.py dispatch; "none" is the bf16/fp32 MXU path)."""
    if quant != "none":
        from . import quant as quant_mod

        if quant == "w8":  # weight-only: every matmul (traffic, not MXU)
            y = quant_mod.w8_linear(x, params["kernel"], params.get("bias"),
                                    compute_dtype=policy.compute_dtype)
            return y.astype(policy.compute_dtype)
        if quant_mod.matmul_wants_int8(quant, params["kernel"].shape[0]):
            y = quant_mod.int8_linear(x, params["kernel"],
                                      params.get("bias"))
            return y.astype(policy.compute_dtype)
    k = params["kernel"].astype(policy.compute_dtype)
    y = jnp.dot(x.astype(policy.compute_dtype), k)
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y
