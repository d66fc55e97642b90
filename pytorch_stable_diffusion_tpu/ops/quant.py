"""Dynamic w8a8 int8 quantization for the UNet's wide contractions.

Motivation (round 2 probe, benchmarks/RESULTS.md): chained square-matmul
sweeps measured int8 ≈ 2.4×/1.9× bf16 at K=1280/2560 on v5e (the MXU's int8
path doubles peak) but 0.6× at K=320 — the quantize/requant overhead swamps
the gain at low arithmetic intensity.  Round 2 concluded "not worthwhile"
from the K=320 loss; VERDICT r2 #2 points out the *mixed* dispatch was
never tried: int8 only where the contraction is wide (the 1280/2560-wide
16²/8² UNet levels, and every 3×3 conv — effective K = 9·C ≥ 2880 even at
C=320), bf16 elsewhere.

Scheme (standard dynamic w8a8, e.g. Jacob et al. 2018 — symmetric, no zero
points):
  * weights: per-output-channel absmax scales, quantized IN-GRAPH — params
    are loop-invariant, so XLA hoists the weight quantization out of the
    compiled denoise loop; no separate "prepare" step, any loader works.
  * activations: per-tensor dynamic absmax scale each call (per-row scales
    are not expressible for convs, and the v5e probe's win already includes
    per-tensor activation quant overhead).
  * accumulate int8×int8 -> int32 on the MXU, dequantize with the fused
    scalar (s_x · s_w[c]) into fp32, then bias.

The reference is fp32-only (no quantization anywhere, SURVEY §2); this is a
TPU-native perf tier, OFF by default until the in-situ hardware A/B
(UNetConfig via SDConfig.quant: "none" | "wide" | "conv").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: contractions narrower than this lose to bf16 (measured: 0.6x at K=320,
#: wins from K=1280; the 640 mid-point is untested -> excluded by default)
MIN_K = 1280


def _absmax_scale(x, axes, eps=1e-12):
    """Symmetric absmax scale over ``axes`` (kept dims), fp32."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(m, eps) / 127.0


def quantize(x, axes):
    """x -> (int8 values, fp32 scale with kept dims)."""
    s = _absmax_scale(x, axes)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def int8_linear(x, kernel, bias=None):
    """(..., K) @ (K, N) with dynamic w8a8.

    Weight scales are per-output-channel; activation scale per-tensor.
    Returns fp32.
    """
    wq, ws = quantize(kernel, axes=0)            # ws: (1, N)
    xq, xs = quantize(x, axes=tuple(range(x.ndim)))
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs.reshape(()) * ws.reshape(-1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def int8_conv(x, kernel, *, stride=1, padding=1, bias=None):
    """NHWC conv with dynamic w8a8.  kernel: HWIO; per-O-channel scales.

    Effective contraction K = kh·kw·C_in (≥ 2880 for every 3×3 SD conv), so
    the int8 MXU win applies at all UNet levels; callers gate 1×1 convs on
    MIN_K instead.
    """
    wq, ws = quantize(kernel, axes=(0, 1, 2))    # ws: (1,1,1,O)
    xq, xs = quantize(x, axes=(0, 1, 2, 3))
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (xs.reshape(()) * ws.reshape(-1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def w8_linear(x, kernel, bias=None, compute_dtype=jnp.bfloat16):
    """(..., K) @ (K, N) with WEIGHT-ONLY int8 (w8a16).

    Motivation: batch-1 latency is weight-traffic heavy (the SD-1.5 UNet
    reads ~1.7 GB of bf16 weights every step); storing weights int8 halves
    that.  Unlike w8a8 there is no activation-quant boundary, so XLA's
    elementwise fusions around the matmul stay intact — the failure mode
    that made w8a8 +67% in situ (benchmarks/RESULTS.md).

    int8 values are exactly representable in bf16, and the per-output-
    channel scale commutes with the contraction, so it is applied to the
    OUTPUT — no dequantized weight copy is ever materialized.  The only
    error vs bf16 is the weight rounding itself (~0.4% relative).
    """
    wq, ws = quantize(kernel, axes=0)            # ws: (1, N)
    y = jnp.dot(x.astype(compute_dtype), wq.astype(compute_dtype))
    y = y.astype(jnp.float32) * ws.reshape(-1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def w8_conv(x, kernel, *, stride=1, padding=1, bias=None,
            compute_dtype=jnp.bfloat16):
    """NHWC conv with weight-only int8 (see w8_linear).  kernel: HWIO."""
    wq, ws = quantize(kernel, axes=(0, 1, 2))    # ws: (1,1,1,O)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), wq.astype(compute_dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype)
    y = y.astype(jnp.float32) * ws.reshape(-1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def conv_wants_int8(quant: str, c_in: int, kh: int = 3) -> bool:
    """Dispatch predicate for convs under quant mode.

    "conv": every conv whose effective K = kh²·c_in ≥ MIN_K (all 3×3 SD
    convs; 1×1 projections only at the wide levels).
    "wide": only c_in ≥ MIN_K (the conservative VERDICT #2 ask).
    """
    if quant == "conv":
        return kh * kh * c_in >= MIN_K
    if quant == "wide":
        return c_in >= MIN_K
    return False


def matmul_wants_int8(quant: str, k: int) -> bool:
    """Dispatch predicate for channel matmuls (attention/GeGLU projections)."""
    return quant in ("wide", "conv") and k >= MIN_K
