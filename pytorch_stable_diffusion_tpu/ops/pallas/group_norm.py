"""Fused GroupNorm(+SiLU) Pallas kernel.

The xprof trace (benchmarks/trace_unet.py) shows ~2.5 ms/forward of
HBM-bound elementwise work around XLA's GroupNorm (stats pass + normalize
pass + activation, each re-reading the activation).  This kernel does one
VMEM-resident pass per (sample): read x once, compute per-group mean/var in
fp32, normalize, scale/shift, optional SiLU, write once.

Applies only when one sample's (HW, C) slab fits VMEM (all UNet stages at
512²: <= 2.6 MB); callers fall back to the XLA path otherwise (VAE's 512²
slabs are 10-70 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: one sample's activation slab must fit comfortably in VMEM
_MAX_SLAB_BYTES = 4 * 1024 * 1024


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float,
            apply_silu: bool):
    # Mosaic cannot reshape the lane (channel) dim, so per-group statistics
    # go through a constant (C, G) group-indicator matmul instead of a
    # (HW, G, C/G) view: channel sums -> group sums -> broadcast back.
    x = x_ref[0].astype(jnp.float32)          # (HW, C)
    hw, c = x.shape
    cg = c // num_groups
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    m = (ch_group == grp).astype(jnp.float32)  # (C, G) indicator

    n = float(hw * cg)
    s1 = jnp.sum(x, axis=0, keepdims=True)     # (1, C)
    mean_c = ((s1 @ m) / n) @ m.T              # (1, C), constant per group
    d = x - mean_c
    var_g = (jnp.sum(d * d, axis=0, keepdims=True) @ m) / n   # (1, G)
    inv_c = jax.lax.rsqrt(var_g + eps) @ m.T   # (1, C)
    y = d * inv_c
    y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def supported(x, num_groups: int) -> bool:
    if x.ndim != 4:
        return False
    n, h, w, c = x.shape
    return (c % num_groups == 0
            and h * w * c * x.dtype.itemsize <= _MAX_SLAB_BYTES)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu"))
def group_norm_silu(x, scale, bias, *, num_groups: int, eps: float = 1e-5,
                    apply_silu: bool = True):
    """x: (N, H, W, C) -> same; fused GN [+ SiLU].  Caller checks supported()."""
    n, h, w, c = x.shape
    xr = x.reshape(n, h * w, c)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps,
                          apply_silu=apply_silu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)
