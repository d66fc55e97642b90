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
    config.addinivalue_line(
        "markers",
        "timeout(seconds): per-test watchdog ceiling override "
        "(default SDT_TEST_TIMEOUT, 900 s; 0 disables)")
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

# ---------------------------------------------------------------------------
# Per-test watchdog (round-3 lesson: a stale expected-raise probe became a
# silent multi-hour 512^2 CPU generation — twice).  Two tiers because a
# Python SIGALRM handler cannot interrupt a thread blocked inside an XLA
# C call:
#   soft  (limit):        SIGALRM raises TimeoutError -> the test FAILS with
#                         a normal traceback whenever control is in Python.
#   hard  (1.5x + 60 s):  faulthandler's watchdog thread dumps all stack
#                         traces and exits the process -- bounded CI even if
#                         the main thread is wedged inside a compile/execute.
# Override per test with @pytest.mark.timeout(seconds); 0 disables.  Scale
# globally with SDT_TEST_TIMEOUT (e.g. slower cold-cache hosts).
# ---------------------------------------------------------------------------
import faulthandler  # noqa: E402
import signal  # noqa: E402
import threading  # noqa: E402

_DEFAULT_TEST_TIMEOUT = float(os.environ.get("SDT_TEST_TIMEOUT", "900"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    limit = _DEFAULT_TEST_TIMEOUT
    marker = item.get_closest_marker("timeout")
    if marker is not None and marker.args:
        limit = float(marker.args[0])
    use_alarm = (limit > 0 and hasattr(signal, "SIGALRM")
                 and threading.current_thread() is threading.main_thread())
    if use_alarm:
        def _on_alarm(signum, frame):
            raise TimeoutError(
                f"{item.nodeid} exceeded the {limit:.0f}s test watchdog "
                f"(override with @pytest.mark.timeout or SDT_TEST_TIMEOUT)")
        prev = signal.signal(signal.SIGALRM, _on_alarm)
        signal.setitimer(signal.ITIMER_REAL, limit)
        faulthandler.dump_traceback_later(limit * 1.5 + 60, exit=True)
    try:
        yield
    finally:
        if use_alarm:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, prev)
            faulthandler.cancel_dump_traceback_later()

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
