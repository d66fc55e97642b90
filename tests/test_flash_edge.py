"""Flash-kernel numerical edges (ops/pallas/flash_attention.py).

The masked-row edge: with the running max initialized to NEG_INF, a kv
block whose every score is masked gives ``exp(s - m_new) = exp(0) = 1`` for
masked entries, temporarily accumulating garbage V rows.  A later unmasked
block self-heals it (alpha = exp(NEG_INF - m_real) = 0 rescales the poison
away) — but a q-row masked in EVERY block outputs the mean of masked V
instead of 0.  Unreachable through today's public callers (causal rows
always see col 0; KV padding never fills a whole row), so the regression
tests drive the kernel's own update function (`_online_update`, the exact
code the Pallas kernel traces) through the masked states directly.
"""

import jax.numpy as jnp
import numpy as np

from pytorch_stable_diffusion_tpu.ops.pallas import flash_attention as fa


def _run_blocks(blocks, v_blocks):
    """Sequence of (block_q, block_k) score blocks through the online update,
    starting from the kernel's init state (m=NEG_INF, l=0, acc=0)."""
    bq = blocks[0].shape[0]
    dh = v_blocks[0].shape[1]
    m = jnp.full((bq, 1), fa.NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)
    for s, v in zip(blocks, v_blocks):
        m, l, acc = fa._online_update(jnp.asarray(s), m, l, acc,
                                      jnp.asarray(v), jnp.float32)
    return np.asarray(acc / np.maximum(np.asarray(l), 1e-30))


def test_fully_masked_leading_block():
    """First kv block entirely masked: its V rows must contribute nothing.
    (Self-heals via alpha=0 even unguarded — kept as a property test.)"""
    rng = np.random.RandomState(0)
    bq, bk, dh = 4, 8, 16
    s_real = rng.randn(bq, bk).astype(np.float32)
    v0 = np.full((bk, dh), 1e6, np.float32)   # poison: leaks if p != 0
    v1 = rng.randn(bk, dh).astype(np.float32)

    masked = np.full((bq, bk), fa.NEG_INF, np.float32)
    got = _run_blocks([masked, s_real], [v0, v1])

    # expected: plain softmax over the real block only
    e = np.exp(s_real - s_real.max(-1, keepdims=True))
    expect = (e / e.sum(-1, keepdims=True)) @ v1
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_partially_masked_leading_block_unchanged():
    """The guard must not perturb the normal path (some cols masked)."""
    rng = np.random.RandomState(1)
    bq, bk, dh = 4, 8, 16
    s = rng.randn(bq, bk).astype(np.float32)
    s[:, 5:] = fa.NEG_INF  # kv_len-style tail mask
    v = rng.randn(bk, dh).astype(np.float32)
    got = _run_blocks([s], [v])
    e = np.exp(s[:, :5] - s[:, :5].max(-1, keepdims=True))
    expect = (e / e.sum(-1, keepdims=True)) @ v[:5]
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_all_blocks_masked_gives_zeros():
    """Row masked in EVERY block: output 0, not the mean of masked V.
    This is the case that is red without the _online_update guard."""
    bq, bk, dh = 2, 4, 8
    masked = np.full((bq, bk), fa.NEG_INF, np.float32)
    v = np.ones((bk, dh), np.float32)
    got = _run_blocks([masked, masked], [v, v])
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got, np.zeros((bq, dh), np.float32))


def test_multipass_kernel_end_to_end_matches_xla():
    """Whole multi-pass path (small block_k forces nk>1) vs the XLA backend,
    confirming the guard costs nothing on reachable inputs."""
    import jax

    from pytorch_stable_diffusion_tpu.core.dtypes import FP32
    from pytorch_stable_diffusion_tpu.ops.attention import _xla_attention

    rng = np.random.RandomState(2)
    q = rng.randn(1, 2, 384, 16).astype(np.float32)
    k = rng.randn(1, 2, 384, 16).astype(np.float32)
    v = rng.randn(1, 2, 384, 16).astype(np.float32)
    for causal in (False, True):
        got = np.asarray(fa.flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal,
            block_q=128, block_k=128))
        expect = np.asarray(_xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal, FP32))
        np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5,
                                   err_msg=f"causal={causal}")
