"""GroupNorm / LayerNorm (functional, NHWC, fp32 statistics).

Reference equivalents: ``nn.GroupNorm(32, C)`` throughout the VAE and UNet
(e.g. ``/root/reference/sd/decoder.py:31,107``) and ``nn.LayerNorm`` in CLIP
and the UNet transformer blocks.  Both use eps=1e-5 (torch default).

Statistics are always computed in ``policy.norm_dtype`` (fp32) regardless of
the bf16 compute path — GroupNorm over 512-channel 512² activations loses
visible precision in bf16.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.dtypes import Policy, FP32

EPS = 1e-5


def init(num_channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_channels,), dtype), "bias": jnp.zeros((num_channels,), dtype)}


def group_norm(params, x, num_groups: int = 32, eps: float = EPS, policy: Policy = FP32):
    """x: (..., C) with C divisible by num_groups; stats over all non-batch
    spatial dims *and* the within-group channel dim (torch semantics)."""
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    if c % num_groups:
        raise ValueError(f"channels {c} not divisible by num_groups {num_groups}")
    xg = x.astype(policy.norm_dtype).reshape(n, -1, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = xg.reshape(x.shape)
    y = y * params["scale"].astype(policy.norm_dtype) + params["bias"].astype(policy.norm_dtype)
    return y.astype(orig_dtype)


def group_norm_silu(params, x, num_groups: int = 32, eps: float = EPS,
                    policy: Policy = FP32, *, backend: str = "xla",
                    apply_silu: bool = True):
    """GroupNorm optionally fused with SiLU — always the XLA lowering.

    ``backend`` is accepted (models thread their attention backend through)
    but no Pallas GN kernel exists anymore: the round-1 single-pass VMEM
    kernel measured a whole-UNet REGRESSION (20.4 -> 26.7 ms) and was
    deleted in round 3 after a bandwidth analysis showed no winnable
    variant — a tiled two-pass grid reads x twice + writes once, exactly
    XLA's traffic, while losing XLA's surrounding elementwise fusions, and
    a channel-split single-pass grid is lane-infeasible at SD's 10
    channels/group.  Full rationale: benchmarks/RESULTS.md "Negative
    results".
    """
    y = group_norm(params, x, num_groups, eps, policy)
    if apply_silu:
        from .act import silu

        y = silu(y)
    return y


def group_norm_silu_folded(params, x, num_groups: int = 32, eps: float = EPS,
                           policy: Policy = FP32, temb=None,
                           apply_silu: bool = True):
    """GN (+ optional per-(B,C) ``temb`` add) -> SiLU with the normalize
    APPLIED in compute dtype as a folded per-(batch, channel) affine.

    Same statistics as :func:`group_norm` (one fp32 reduce over spatial +
    within-group channels), but instead of materializing the fp32
    ``(x - mean) * rstd`` full-tensor intermediate and casting back, the
    whole normalize+scale+bias (+temb) collapses to tiny fp32 ``(B, C)``
    scale/shift arrays and ONE compute-dtype multiply-add that XLA can
    fuse straight into the consumer conv — the ``ops/pallas/conv.py``
    ``fold_gn_affine`` trick on the pure-XLA path (opt-in
    ``conv_backend="fold"``; targets SDXL's 233-instance norm-stat
    convert_reduce profile, RESULTS.md "SDXL trace").  Differs from the
    exact path only by bf16 rounding of the affine apply.
    """
    from .act import silu
    from .pallas.conv import fold_gn_affine

    scale, shift = fold_gn_affine(params, x, num_groups, eps=eps, temb=temb,
                                  norm_dtype=policy.norm_dtype)
    bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    y = x * scale.reshape(bshape).astype(x.dtype) \
        + shift.reshape(bshape).astype(x.dtype)
    return silu(y) if apply_silu else y


def layer_norm_folded(params, x, eps: float = EPS, policy: Policy = FP32):
    """LayerNorm with fp32 per-token statistics but the normalize applied
    in compute dtype (the :func:`group_norm_silu_folded` trick for the
    transformer-block LNs — 210 of SDXL's 233 norm-stat convert_reduce
    instances; opt-in via ``conv_backend="fold"``).  Differs from
    :func:`layer_norm` only by bf16 rounding of the affine apply."""
    nd = policy.norm_dtype
    xf = x.astype(nd)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jnp.reciprocal(jnp.sqrt(var + eps))
    gamma = params["scale"].astype(nd)
    scale = (rstd * gamma).astype(x.dtype)
    shift = (params["bias"].astype(nd) - mean * rstd * gamma).astype(x.dtype)
    return x * scale + shift


def layer_norm(params, x, eps: float = EPS, policy: Policy = FP32):
    orig_dtype = x.dtype
    xf = x.astype(policy.norm_dtype)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * params["scale"].astype(policy.norm_dtype) + params["bias"].astype(policy.norm_dtype)
    return y.astype(orig_dtype)
