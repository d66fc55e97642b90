"""Test environment: CPU backend with 8 virtual devices (SURVEY §4.5) so
data-parallel mesh tests run without a TPU slice.  Must set env before jax
imports anywhere."""

import os
import sys

# On the TPU host, the axon sitecustomize (PYTHONPATH=/root/.axon_site)
# imports jax at interpreter startup with JAX_PLATFORMS=axon — long before
# this file can force CPU.  Running the suite against the live relay is both
# wrong (tests assume 8 virtual CPU devices) and harmful (it drives the
# fragile remote-compile service).  Detect that case and re-exec pytest with
# a scrubbed environment (done in pytest_configure so global output capture
# can be suspended first — an exec'd child would otherwise write into
# pytest's capture temp file and its output would vanish).
_NEEDS_CPU_REEXEC = (
    "jax" in sys.modules
    and os.environ.get("JAX_PLATFORMS", "cpu").lower() != "cpu"
    and not os.environ.get("_SDT_PYTEST_REEXEC")
)


def pytest_configure(config):
    if not _NEEDS_CPU_REEXEC:
        return
    env = dict(os.environ)
    env["_SDT_PYTEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disables the axon sitecustomize
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    sys.stderr.write("[conftest] jax was pre-imported with a non-CPU backend "
                     "(axon site hook); re-executing pytest on CPU with 8 "
                     "virtual devices...\n")
    sys.stderr.flush()
    argv = [sys.executable, "-m", "pytest"] + list(config.invocation_params.args)
    os.execve(sys.executable, argv, env)


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
