"""Chunked one-pass flash kernel paths (ops/pallas/flash_attention.py).

The one-pass kernel processes KV as independent chunks merged by the flash
rescaling identity.  These tests pin the dispatch (chunk/block_q selection
under the VMEM model) and check numerics on every structural case: multiple
chunks, a masked KV tail inside the last chunk, causal masking across chunk
boundaries, and odd (non-power-of-two) chunk counts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_stable_diffusion_tpu.core.dtypes import FP32
from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention
from pytorch_stable_diffusion_tpu.ops.pallas import flash_attention as fa


def test_chunk_selection_model():
    """Dispatch table for the SD shapes (bf16 KV, itemsize 2)."""
    def pick(skp, dh):
        bq = 512
        while bq > 128 and fa._pick_chunk(bq, skp, dh, 2) is None:
            bq //= 2
        return bq, fa._pick_chunk(bq, skp, dh, 2)

    assert pick(4096, 40) == (512, 512)     # 512² top level
    assert pick(1024, 80) == (512, 512)     # 32² level
    assert pick(256, 160) == (512, 256)     # 16² level, single chunk
    bq, chunk = pick(9216, 40)              # 768² level
    assert (bq, chunk) == (256, 1024)       # shrunk block_q, 9 chunks
    # 1024² level (16384 tokens): past the verified one-pass envelope —
    # Mosaic's real allocation (16.06M measured) exceeds the additive model;
    # the multi-pass grid takes over
    assert fa._pick_chunk(128, 16384, 40, 2) is None
    # VAE head_dim 512 at 4096 tokens does not fit one-pass -> multipass
    assert fa._pick_chunk(128, 4096, 512, 2) is None


@pytest.mark.parametrize("s,heads,dh", [
    (512, 4, 16),    # multi-head lane slicing
    (576, 2, 16),    # S not a multiple of 128 (the 768² 24² level shape class)
    (300, 1, 32),    # padded KV + single head
    (2048, 2, 16),   # ≥2 chunks of 1024: the multi-chunk merge actually runs
])
def test_bsc_matches_headsplit(s, heads, dh):
    """The (B,S,H*D) kernel == head-split reference on every layout case."""
    key = jax.random.PRNGKey(7)
    c = heads * dh
    q = jax.random.normal(jax.random.fold_in(key, 1), (2, s, c), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 2), (2, s, c), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 3), (2, s, c), jnp.float32)

    def split(x):
        return x.reshape(2, s, heads, dh).transpose(0, 2, 1, 3)

    got = np.asarray(fa.flash_attention_bsc(q, k, v, n_heads=heads,
                                            block_q=128))
    ref = np.asarray(_xla_attention(split(q), split(k), split(v), False, FP32)
                     .transpose(0, 2, 1, 3).reshape(2, s, c))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_bsc_dispatch_model():
    # 512² UNet levels fit; 9216-token KV at C=320 does not (falls back)
    assert fa.bsc_fits(4096, 4096, 320)
    assert fa.bsc_fits(1024, 1024, 640)
    assert fa.bsc_fits(256, 256, 1280)
    assert not fa.bsc_fits(9216, 9216, 320)
    assert not fa.bsc_fits(64, 64, 1280)  # short seq -> XLA path anyway


@pytest.mark.parametrize("sq,sk,dh,causal", [
    (1152, 1152, 16, False),   # 9 chunks of 128 (odd count), exact KV
    (1024, 1019, 16, False),   # masked tail inside the last chunk
    (640, 640, 16, True),      # causal, single 640-token chunk
    (1024, 1024, 16, True),    # causal ACROSS chunk boundaries (2 x 512:
                               # rows of chunk 0 mask all of chunk 1, so the
                               # fully-masked-chunk merge path runs too)
    (512, 300, 16, False),     # padded KV, partial final chunk
])
def test_chunked_matches_xla(sq, sk, dh, causal):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, sq, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, sk, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 3), (1, 2, sk, dh), jnp.float32)
    # force multi-chunk one-pass: block_k == padded sk selects the one-pass
    # kernel; _pick_chunk then splits it internally
    got = np.asarray(fa.flash_attention(q, k, v, causal=causal, block_q=128))
    ref = np.asarray(_xla_attention(q, k, v, causal, FP32))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sq,sk,dh,causal,bq,bk", [
    # multi-pass grid (nk > 1) with chunked kv steps (round 3): 4 chunks of
    # 512 inside each 2048-token step, running m/l/acc merge across steps
    (512, 4096, 16, False, 128, 2048),
    # kv tail inside the LAST grid step's last chunk (last_base static bound)
    (512, 4000, 16, False, 128, 2048),
    # causal multi-pass with chunks (block_q == block_k rule)
    (2048, 2048, 16, True, 1024, 1024),
    # the swept wide-kv-step multipass: block_k 8192, 16 chunks of 512
    (256, 16384, 16, False, 128, 8192),
    # block_k 4096 prefers chunk 2048 (round-3 sweep): 2-chunk merge path
    (512, 4096, 16, False, 128, 4096),
])
def test_multipass_chunked_matches_xla(sq, sk, dh, causal, bq, bk):
    key = jax.random.PRNGKey(5)
    q = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, sq, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, sk, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 3), (1, 1, sk, dh), jnp.float32)
    got = np.asarray(fa.flash_attention(q, k, v, causal=causal,
                                        block_q=bq, block_k=bk))
    ref = np.asarray(_xla_attention(q, k, v, causal, FP32))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_streamed_long_kv_dispatch_matches_multipass():
    """Default dispatch for non-causal KV > 9216 is the manual-DMA streamed
    kernel (round 3); it must agree with the multi-pass grid, and both are
    individually XLA-validated elsewhere.  kv tail (10100 -> padded 12288)
    crosses a group boundary."""
    key = jax.random.PRNGKey(9)
    q = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 512, 16), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 10100, 16), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 3), (1, 1, 10100, 16), jnp.float32)
    got = np.asarray(fa.flash_attention(q, k, v))          # streamed default
    ref = np.asarray(fa.flash_attention(q, k, v, block_q=128, block_k=2048))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
