"""Dtype policy for TPU execution.

The reference (``/root/reference/sd``) runs fp32 end-to-end (torch default).
On TPU the MXU wants bfloat16 inputs; numerically sensitive ops (GroupNorm,
LayerNorm, softmax, the DDPM schedule math) stay in float32.  The policy
object threads through every layer so tests can pin fp32 for parity against
the torch oracle while benchmarks run the bf16 production path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Per-role dtypes.

    param_dtype:   storage dtype of weights in HBM.
    compute_dtype: dtype fed to matmuls/convs (MXU path).
    norm_dtype:    accumulation dtype for GroupNorm/LayerNorm statistics.
    softmax_dtype: dtype for attention logits/softmax.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    softmax_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_norm(self, x):
        return x.astype(self.norm_dtype)


#: fp32 everywhere — matches the reference numerics; used by parity tests.
FP32 = Policy()

#: Production TPU policy: bf16 storage + MXU, fp32 norms/softmax.
BF16 = Policy(
    param_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    norm_dtype=jnp.float32,
    softmax_dtype=jnp.float32,
)

#: bf16 compute over fp32 master weights (cast at use).
MIXED = Policy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.bfloat16,
    norm_dtype=jnp.float32,
    softmax_dtype=jnp.float32,
)


def cast_pytree(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``."""
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
