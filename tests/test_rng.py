"""PRNG-stream contract tests.

The named-stream scheme (core/rng.py) replaces the reference's call-order
torch.Generator discipline (ref sd/pipeline.py:92-98).  Once shipped, the
stream derivation must NEVER change silently — that would change every
user's outputs for a fixed seed.  These goldens freeze it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_stable_diffusion_tpu.core import rng


def test_streams_distinct():
    key = jax.random.PRNGKey(0)
    names = ["latent_init", "encoder_noise", "sampler"]
    keys = [tuple(np.asarray(jax.random.key_data(rng.stream(key, n)))) for n in names]
    assert len(set(keys)) == len(names)


def test_stream_tags_are_name_hashes():
    """Tags derive from sha256(name) — adding streams never renumbers
    existing ones."""
    import hashlib

    for name in ("latent_init", "encoder_noise", "sampler"):
        expect = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
        assert rng._tag(name) == expect


def test_golden_noise_values():
    """First values of each stream for seed 1337 — frozen contract."""
    key = jax.random.PRNGKey(1337)
    vals = {
        name: float(jax.random.normal(rng.stream(key, name), ()))
        for name in ("latent_init", "encoder_noise")
    }
    step_val = float(jax.random.normal(rng.step_key(key, "sampler", 0), ()))
    batch0 = float(jax.random.normal(rng.batch_keys(key, "latent_init", 4)[0], ()))

    golden = {
        "latent_init": vals["latent_init"],
        "encoder_noise": vals["encoder_noise"],
        "sampler_step0": step_val,
        "batch0": batch0,
    }
    # Recorded goldens (jax threefry is stable across versions/platforms).
    expect = {
        "latent_init": 1.1240590810775757,
        "encoder_noise": -1.862389326095581,
        "sampler_step0": -1.0347868204116821,
        "batch0": 0.18177466094493866,
    }
    for k, v in expect.items():
        np.testing.assert_allclose(golden[k], v, rtol=1e-6, err_msg=k)


def test_batch_keys_prefix_invariant():
    """Sample i's key must not depend on batch size (shard invariance)."""
    key = jax.random.PRNGKey(7)
    k4 = rng.batch_keys(key, "latent_init", 4)
    k8 = rng.batch_keys(key, "latent_init", 8)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(k4)),
                                  np.asarray(jax.random.key_data(k8[:4])))


def test_step_key_traced():
    key = jax.random.PRNGKey(0)

    @jax.jit
    def f(i):
        return jax.random.normal(rng.step_key(key, "sampler", i), ())

    assert float(f(3)) == float(jax.random.normal(
        rng.step_key(key, "sampler", 3), ()))
