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
    bq, chunk = pick(16384, 40)             # 1024² level
    assert (bq, chunk) == (128, 1024)
    # VAE head_dim 512 at 4096 tokens does not fit one-pass -> multipass
    assert fa._pick_chunk(128, 4096, 512, 2) is None


@pytest.mark.parametrize("sq,sk,dh,causal", [
    (1152, 1152, 16, False),   # 9 chunks of 128 (odd count), exact KV
    (1024, 1019, 16, False),   # masked tail inside the last chunk
    (640, 640, 16, True),      # causal across chunk boundaries
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
