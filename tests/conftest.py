"""Test environment: CPU backend with 8 virtual devices (SURVEY §4.5) so
data-parallel mesh tests run without a TPU slice.  Must set env before jax
imports anywhere."""

import os
import sys

# Hard-set CPU: the TPU host environment presets JAX_PLATFORMS=axon, and
# tests must run on the virtual-device CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pytorch_stable_diffusion_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("~/.cache/sdt_xla_tests")


@pytest.fixture(scope="session")
def tiny_cfg():
    from pytorch_stable_diffusion_tpu.models.config import tiny_sd_config

    return tiny_sd_config()


@pytest.fixture(scope="session")
def tiny_models(tiny_cfg):
    from pytorch_stable_diffusion_tpu.models import clip, unet, vae

    key = jax.random.PRNGKey(42)
    return {
        "clip": clip.init(jax.random.fold_in(key, 0), tiny_cfg.clip),
        "encoder": vae.init_encoder(jax.random.fold_in(key, 1), tiny_cfg.vae),
        "decoder": vae.init_decoder(jax.random.fold_in(key, 2), tiny_cfg.vae),
        "diffusion": unet.init(jax.random.fold_in(key, 3), tiny_cfg.unet),
    }


@pytest.fixture(scope="session")
def tiny_state_dict(tiny_cfg, tiny_models):
    """CompVis-format view of tiny_models (exercises the converter inverse)."""
    from pytorch_stable_diffusion_tpu.weights import convert

    return convert.deconvert(tiny_models, tiny_cfg)


@pytest.fixture(scope="session")
def tiny_tokenizer(tiny_cfg):
    from pytorch_stable_diffusion_tpu.weights.tokenizer import make_test_tokenizer

    return make_test_tokenizer(["a", "cat", "dog", "photo", "of"],
                               max_len=tiny_cfg.clip.max_len)


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def psnr(a, b):
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    mse = np.mean((a - b) ** 2)
    peak = max(np.abs(a).max(), 1e-12)
    return 10.0 * np.log10(peak**2 / max(mse, 1e-30))
