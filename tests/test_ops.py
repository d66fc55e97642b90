"""Op-level parity vs torch (NHWC ours vs NCHW torch; SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pytorch_stable_diffusion_tpu.ops import act, attention, conv, linear, norm
from pytorch_stable_diffusion_tpu.ops.conv import ASYM_DOWN, upsample_nearest_2x

from conftest import to_nchw, to_nhwc

RTOL, ATOL = 2e-5, 2e-5


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_linear_matches_torch():
    p = linear.init(jax.random.PRNGKey(0), 8, 16)
    x = _rand(2, 5, 8)
    ours = np.asarray(linear.apply(p, jnp.asarray(x)))
    theirs = F.linear(torch.as_tensor(x),
                      torch.as_tensor(np.asarray(p["kernel"]).T),
                      torch.as_tensor(np.asarray(p["bias"]))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def _torch_conv(p, x_nhwc, stride, padding):
    w = torch.as_tensor(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
    b = torch.as_tensor(np.asarray(p["bias"]))
    xt = torch.as_tensor(to_nchw(x_nhwc))
    return to_nhwc(F.conv2d(xt, w, b, stride=stride, padding=padding).numpy())


def test_conv_symmetric_pad():
    p = conv.init(jax.random.PRNGKey(1), 3, 8, 3)
    x = _rand(2, 10, 10, 3)
    ours = np.asarray(conv.apply(p, jnp.asarray(x), padding=1))
    np.testing.assert_allclose(ours, _torch_conv(p, x, 1, 1), rtol=RTOL, atol=ATOL)


def test_conv_stride2_unet_style():
    """stride-2 pad=1 (ref sd/diffusion.py:553)."""
    p = conv.init(jax.random.PRNGKey(2), 4, 4, 3)
    x = _rand(1, 8, 8, 4)
    ours = np.asarray(conv.apply(p, jnp.asarray(x), stride=2, padding=1))
    theirs = _torch_conv(p, x, 2, 1)
    assert ours.shape == theirs.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_conv_stride2_vae_asymmetric_pad():
    """stride-2 pad=0 + F.pad(0,1,0,1) right/bottom (ref sd/encoder.py:118-122)."""
    p = conv.init(jax.random.PRNGKey(3), 4, 4, 3)
    x = _rand(1, 9, 9, 4)  # odd size: asymmetric vs symmetric differ
    ours = np.asarray(conv.apply(p, jnp.asarray(x), stride=2, padding=ASYM_DOWN))
    w = torch.as_tensor(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
    b = torch.as_tensor(np.asarray(p["bias"]))
    xt = F.pad(torch.as_tensor(to_nchw(x)), (0, 1, 0, 1))
    theirs = to_nhwc(F.conv2d(xt, w, b, stride=2, padding=0).numpy())
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)
    # and it differs from symmetric padding (guards the silent-wrong case)
    sym = np.asarray(conv.apply(p, jnp.asarray(x), stride=2, padding=1))
    assert sym.shape != ours.shape or not np.allclose(sym, ours)


def test_conv_1x1():
    p = conv.init(jax.random.PRNGKey(4), 6, 2, 1)
    x = _rand(2, 5, 5, 6)
    ours = np.asarray(conv.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, _torch_conv(p, x, 1, 0), rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch():
    p = norm.init(8)
    p = {"scale": jnp.asarray(_rand(8, seed=5)), "bias": jnp.asarray(_rand(8, seed=6))}
    x = _rand(2, 4, 4, 8, seed=7)
    ours = np.asarray(norm.group_norm(p, jnp.asarray(x), num_groups=4))
    theirs = to_nhwc(F.group_norm(
        torch.as_tensor(to_nchw(x)), 4,
        torch.as_tensor(np.asarray(p["scale"])),
        torch.as_tensor(np.asarray(p["bias"])), eps=1e-5).numpy())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    p = {"scale": jnp.asarray(_rand(16, seed=8)), "bias": jnp.asarray(_rand(16, seed=9))}
    x = _rand(2, 7, 16, seed=10)
    ours = np.asarray(norm.layer_norm(p, jnp.asarray(x)))
    theirs = F.layer_norm(torch.as_tensor(x), (16,),
                          torch.as_tensor(np.asarray(p["scale"])),
                          torch.as_tensor(np.asarray(p["bias"])), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_activations_match_torch():
    x = _rand(64, seed=11)
    np.testing.assert_allclose(np.asarray(act.silu(jnp.asarray(x))),
                               F.silu(torch.as_tensor(x)).numpy(),
                               rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(act.quick_gelu(jnp.asarray(x))),
        (torch.as_tensor(x) * torch.sigmoid(1.702 * torch.as_tensor(x))).numpy(),
        rtol=RTOL, atol=ATOL)


def test_geglu_and_quirk():
    h = _rand(3, 8, seed=12)
    ht = torch.as_tensor(h)
    a, gate = ht.chunk(2, dim=-1)
    correct = (a * F.gelu(gate)).numpy()
    np.testing.assert_allclose(np.asarray(act.geglu(jnp.asarray(h))), correct,
                               rtol=RTOL, atol=ATOL)
    # quirk path drops the gate entirely (ref sd/diffusion.py:359-363)
    np.testing.assert_allclose(
        np.asarray(act.geglu(jnp.asarray(h), reference_quirks=True)),
        a.numpy(), rtol=RTOL, atol=ATOL)


def test_upsample_nearest():
    x = _rand(1, 3, 3, 4, seed=13)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    theirs = to_nhwc(F.interpolate(torch.as_tensor(to_nchw(x)),
                                   scale_factor=2, mode="nearest").numpy())
    np.testing.assert_array_equal(ours, theirs)


# --------------------------------------------------------------- attention
def _torch_attention(p, x, ctx, n_heads, causal):
    from torch_oracle import sdp_attention

    def tl(pp, y, bias):
        w = torch.as_tensor(np.asarray(pp["kernel"]).T)
        b = torch.as_tensor(np.asarray(pp["bias"])) if bias else None
        return F.linear(y, w, b)

    xt = torch.as_tensor(x)
    ct = torch.as_tensor(ctx if ctx is not None else x)
    has_in_bias = "bias" in p["q"]
    q = tl(p["q"], xt, has_in_bias)
    k = tl(p["k"], ct, has_in_bias)
    v = tl(p["v"], ct, has_in_bias)
    o = sdp_attention(q, k, v, n_heads, causal)
    return tl(p["out"], o, "bias" in p["out"]).numpy()


@pytest.mark.parametrize("causal", [False, True])
def test_self_attention_matches_reference_semantics(causal):
    p = attention.init(jax.random.PRNGKey(5), 4, 16)
    x = _rand(2, 9, 16, seed=14)
    ours = np.asarray(attention.apply(p, jnp.asarray(x), n_heads=4, causal=causal))
    theirs = _torch_attention(p, x, None, 4, causal)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_cross_attention_no_padding_mask():
    """KV length != Q length; reference applies no mask (attention.py:219-229)."""
    p = attention.init(jax.random.PRNGKey(6), 2, 8, d_cross=12, in_bias=False)
    x = _rand(1, 6, 8, seed=15)
    ctx = _rand(1, 5, 12, seed=16)
    ours = np.asarray(attention.apply(p, jnp.asarray(x), jnp.asarray(ctx), n_heads=2))
    theirs = _torch_attention(p, x, ctx, 2, False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (1, 2, 16, 16, 8),    # tiny
    (1, 2, 40, 24, 16),   # non-multiple-of-block seq + kv mask path
])
def test_flash_attention_matches_xla(shape):
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    b, h, sq, sk, d = shape
    rng = np.random.RandomState(17)
    q = jnp.asarray(rng.randn(b, h, sq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v, block_q=16, block_k=16))
    ref = np.asarray(_xla_attention(q, k, v, False, FP32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_causal():
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(18)
    q = jnp.asarray(rng.randn(1, 2, 32, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 32, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 32, 8), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v, causal=True, block_q=16, block_k=16))
    ref = np.asarray(_xla_attention(q, k, v, True, FP32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,causal", [
    ((1, 2, 64, 64, 8), False),    # one-pass, exact block
    ((1, 2, 48, 33, 8), False),    # one-pass with kv padding mask
    ((1, 2, 32, 32, 8), True),     # one-pass causal
])
def test_flash_attention_one_pass_path(shape, causal):
    """Default block_k covers the whole KV -> single-pass kernel (no scratch)."""
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.ops.pallas.flash_attention import flash_attention

    b, h, sq, sk, d = shape
    rng = np.random.RandomState(19)
    q = jnp.asarray(rng.randn(b, h, sq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v, causal=causal, block_q=16))
    ref = np.asarray(_xla_attention(q, k, v, causal, FP32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_multipass_long_kv():
    """Explicit small block_k forces the online-softmax multi-pass path
    (the default takes it only when one pass would blow the VMEM budget)."""
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(20)
    q = jnp.asarray(rng.randn(1, 1, 64, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 4160, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 4160, 8), jnp.float32)
    ours = np.asarray(fa.flash_attention(q, k, v, block_q=64, block_k=1024))
    ref = np.asarray(_xla_attention(q, k, v, False, FP32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_default_blocks_one_pass_9216():
    """768² regime: default block choice keeps one pass by shrinking block_q
    (scores 128x9216x4B = 4.7MB <= budget)."""
    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
    from pytorch_stable_diffusion_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(21)
    # small head count/dim to keep CPU interpret fast; seq is what matters
    q = jnp.asarray(rng.randn(1, 1, 256, 8), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, 9216, 8), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, 9216, 8), jnp.float32)
    ours = np.asarray(fa.flash_attention(q, k, v))
    ref = np.asarray(_xla_attention(q, k, v, False, FP32))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)



