"""Dynamic w8a8 int8 path (ops/quant.py) — the round-3 conv-MFU lever.

CPU tests pin numerics and dispatch; the perf claim is settled by the
in-situ hardware A/B (benchmarks/exp_int8_insitu.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_stable_diffusion_tpu.ops import conv, linear, quant

rng = np.random.RandomState(0)


def test_quantize_roundtrip_error_bound():
    x = jnp.asarray(rng.randn(64, 256).astype(np.float32))
    q, s = quant.quantize(x, axes=(0, 1))
    deq = q.astype(jnp.float32) * s
    # symmetric absmax: error <= scale/2 per element
    assert float(jnp.max(jnp.abs(deq - x))) <= float(s.reshape(())) / 2 + 1e-7


def test_int8_linear_matches_dequantized_reference():
    """The int8 matmul must EXACTLY equal the fp32 matmul of the quantized
    operands (int32 accumulation is exact)."""
    x = jnp.asarray(rng.randn(8, 1280).astype(np.float32))
    w = jnp.asarray((rng.randn(1280, 320) * 0.02).astype(np.float32))
    b = jnp.asarray(rng.randn(320).astype(np.float32))
    got = np.asarray(quant.int8_linear(x, w, b))

    xq, xs = quant.quantize(x, axes=(0, 1))
    wq, ws = quant.quantize(w, axes=0)
    ref = (xq.astype(np.float32) @ wq.astype(np.float32)) \
        * (np.asarray(xs).reshape(()) * np.asarray(ws).reshape(-1)) \
        + np.asarray(b)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # and close to the unquantized product (well-conditioned gaussian data)
    exact = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.abs(got - exact).mean() / np.abs(exact).mean()
    assert rel < 0.02, rel


def test_int8_conv_matches_dequantized_reference():
    x = jnp.asarray(rng.randn(2, 8, 8, 160).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 160, 160) * 0.02).astype(np.float32))
    got = np.asarray(quant.int8_conv(x, w, stride=1, padding=1))

    xq, xs = quant.quantize(x, axes=(0, 1, 2, 3))
    wq, ws = quant.quantize(w, axes=(0, 1, 2))
    ref = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = np.asarray(ref) * (np.asarray(xs).reshape(())
                             * np.asarray(ws).reshape(-1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dispatch_predicates():
    # "wide": only the 1280/2560 levels (VERDICT r2 #2's conservative ask)
    assert quant.matmul_wants_int8("wide", 1280)
    assert not quant.matmul_wants_int8("wide", 320)
    assert not quant.matmul_wants_int8("none", 2560)
    # "conv": every 3x3 (effective K = 9C), 1x1 only when wide
    assert quant.conv_wants_int8("conv", 320, 3)      # K=2880
    assert not quant.conv_wants_int8("conv", 320, 1)  # K=320
    assert quant.conv_wants_int8("conv", 1280, 1)
    assert not quant.conv_wants_int8("wide", 320, 3)
    assert quant.conv_wants_int8("wide", 1280, 3)


def test_conv_apply_quant_dispatch():
    """conv.apply with quant='conv' routes wide kernels to int8 and leaves
    narrow ones exact."""
    key = jax.random.PRNGKey(1)
    p = conv.init(key, 160, 160, 3)
    x = jnp.asarray(rng.randn(1, 8, 8, 160).astype(np.float32))
    exact = np.asarray(conv.apply(p, x, padding=1))
    q = np.asarray(conv.apply(p, x, padding=1, quant="conv"))
    assert not np.array_equal(q, exact)            # int8 path actually taken
    rel = np.abs(q - exact).mean() / np.abs(exact).mean()
    assert rel < 0.05, rel

    p_small = conv.init(key, 16, 16, 3)            # K=144 < 1280 -> exact
    xs = jnp.asarray(rng.randn(1, 8, 8, 16).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(conv.apply(p_small, xs, padding=1, quant="conv")),
        np.asarray(conv.apply(p_small, xs, padding=1)))


def test_tiny_unet_quant_inert():
    """At tiny-config widths nothing crosses MIN_K: quant='conv' must be
    bit-identical to 'none' (dispatch is purely static)."""
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg = tiny_sd_config()
    key = jax.random.PRNGKey(0)
    params = unet.init(key, cfg.unet)
    lat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    a = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg.unet))(params, lat, ctx))
    b = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg.unet, quant="conv"))(params, lat, ctx))
    np.testing.assert_array_equal(a, b)


def test_mid_unet_quant_active_and_sane():
    """A width-160 UNet (3x3 K=1440 >= MIN_K) takes the int8 path end to
    end: output differs from exact but stays close (random weights)."""
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import UNetConfig

    cfg = UNetConfig(model_channels=160, ch_mults=(1, 2),
                     attn_levels=(True, False), n_heads=4, d_context=64,
                     groups=16)
    key = jax.random.PRNGKey(0)
    params = unet.init(key, cfg)
    lat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(1, 16, 64).astype(np.float32))
    a = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg))(params, lat, ctx))
    b = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg, quant="conv"))(params, lat, ctx))
    assert not np.array_equal(a, b)
    assert np.isfinite(b).all()
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.1, rel


# ------------------------------------------------- weight-only int8 ("w8")
def test_w8_linear_matches_output_scaled_reference():
    """w8 must equal x @ dequant(w) exactly in math: the per-O-channel
    scale commutes with the contraction, so output-scaling == weight
    dequantization."""
    x = jnp.asarray(rng.randn(8, 320).astype(np.float32))
    w = jnp.asarray((rng.randn(320, 640) * 0.02).astype(np.float32))
    b = jnp.asarray(rng.randn(640).astype(np.float32))
    got = np.asarray(quant.w8_linear(x, w, b, compute_dtype=jnp.float32))

    wq, ws = quant.quantize(w, axes=0)
    deq = np.asarray(wq, np.float32) * np.asarray(ws)
    ref = np.asarray(x) @ deq + np.asarray(b)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # close to exact: weight rounding only (no activation quantization)
    exact = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.abs(got - exact).mean() / np.abs(exact).mean()
    assert rel < 0.01, rel


def test_w8_conv_matches_output_scaled_reference():
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, 32, 64) * 0.05).astype(np.float32))
    got = np.asarray(quant.w8_conv(x, w, compute_dtype=jnp.float32))
    wq, ws = quant.quantize(w, axes=(0, 1, 2))
    deq = np.asarray(wq, np.float32) * np.asarray(ws)
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, jnp.asarray(deq), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_w8_applies_at_every_width():
    """Unlike w8a8, w8 is traffic-motivated: it takes the quant path even
    at K far below MIN_K (tiny config), changing the output slightly."""
    from pytorch_stable_diffusion_tpu.models import unet
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg = tiny_sd_config()
    key = jax.random.PRNGKey(0)
    params = unet.init(key, cfg.unet)
    lat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(1, 16, 32).astype(np.float32))
    a = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg.unet))(params, lat, ctx))
    b = np.asarray(jax.jit(lambda p, l, c: unet.apply(
        p, l, c, 500, cfg.unet, quant="w8"))(params, lat, ctx))
    assert not np.array_equal(a, b)
    assert np.isfinite(b).all()
    rel = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9)
    assert rel < 0.05, rel


def test_w8_pipeline_end_to_end(tiny_models, tiny_tokenizer):
    import dataclasses

    import pytorch_stable_diffusion_tpu as sdt
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    cfg = dataclasses.replace(tiny_sd_config(), quant="w8")
    img = sdt.generate("a cat", models=tiny_models, tokenizer=tiny_tokenizer,
                       seed=3, n_inference_steps=2, config=cfg,
                       height=16, width=16)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img, np.float64)).all()
