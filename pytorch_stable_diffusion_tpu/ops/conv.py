"""2-D convolution, NHWC (TPU-native layout).

The reference uses torch NCHW Conv2d everywhere; on TPU, NHWC keeps the
channel dim on the 128-lane minor axis so XLA tiles convs onto the MXU
without layout transposes.  Kernel layout HWIO.

Padding semantics the reference relies on (SURVEY §2.2):
  * VAE-encoder downsampling: stride-2, pad=0 plus a manual *asymmetric*
    F.pad(x, (0,1,0,1)) — right/bottom only (``/root/reference/sd/encoder.py:62,118-122``).
  * UNet downsampling: stride-2 with symmetric pad=1 (``sd/diffusion.py:553``).
``padding`` therefore accepts an int (symmetric, torch-style) or explicit
per-edge ((top,bottom),(left,right)).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..core.dtypes import Policy, FP32

PadT = Union[int, Tuple[Tuple[int, int], Tuple[int, int]]]

#: right/bottom-only padding used by VAE-encoder stride-2 convs
ASYM_DOWN: PadT = ((0, 1), (0, 1))

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

#: trace-time flag: every conv pads circularly (wrap) instead of with
#: zeros — A1111's --tiling / seamless-texture mode.  Set via the context
#: manager around the traced function; compiled variants are keyed by the
#: pipeline's static ``tiling`` flag, so graphs never mix.
_CIRCULAR = contextvars.ContextVar("conv_circular", default=False)


@contextlib.contextmanager
def circular_padding(on: bool = True):
    token = _CIRCULAR.set(on)
    try:
        yield
    finally:
        _CIRCULAR.reset(token)


def circular_padding_active() -> bool:
    """Trace-time query — fused kernels that zero-pad must fall back."""
    return _CIRCULAR.get()


def init(key, c_in: int, c_out: int, ksize: int = 3, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = c_in * ksize * ksize
    bound = 1.0 / (fan_in**0.5)
    p = {"kernel": jax.random.uniform(kw, (ksize, ksize, c_in, c_out), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return p


def apply(params, x, stride: int = 1, padding: PadT = 0, policy: Policy = FP32,
          quant: str = "none"):
    """x: (N, H, W, C_in) -> (N, H', W', C_out).

    ``quant`` ("none" | "wide" | "conv"): dynamic w8a8 int8 path for wide
    contractions (ops/quant.py) — dispatch decided here from the kernel's
    effective K = kh·kw·C_in.
    """
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = padding
    if _CIRCULAR.get() and pad != ((0, 0), (0, 0)):
        # seamless-tiling mode: wrap-pad (periodic boundary), then VALID
        x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), mode="wrap")
        pad = ((0, 0), (0, 0))
    if quant != "none":
        from . import quant as quant_mod

        if quant == "w8":  # weight-only: every conv (traffic, not MXU)
            y = quant_mod.w8_conv(x, params["kernel"], stride=stride,
                                  padding=pad, bias=params.get("bias"),
                                  compute_dtype=policy.compute_dtype)
            return y.astype(policy.compute_dtype)
        kh, _, c_in, _ = params["kernel"].shape
        if quant_mod.conv_wants_int8(quant, c_in, kh):
            y = quant_mod.int8_conv(x, params["kernel"], stride=stride,
                                    padding=pad, bias=params.get("bias"))
            return y.astype(policy.compute_dtype)
    k = params["kernel"].astype(policy.compute_dtype)
    y = lax.conv_general_dilated(
        x.astype(policy.compute_dtype),
        k,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=policy.compute_dtype,
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (reference: nn.Upsample(scale_factor=2),
    ``/root/reference/sd/decoder.py:269`` and ``sd/diffusion.py:384-435``)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
