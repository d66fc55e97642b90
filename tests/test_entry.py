"""Driver entry points: entry() traces; dryrun_multichip executes on the
8-virtual-device mesh."""

import os
import pytest
import sys

import jax
import numpy as np


def _load_entry():
    import importlib.util
    from conftest import _REPO

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", f"{_REPO}/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_traces():
    mod = _load_entry()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 64, 64, 4)


@pytest.mark.parametrize("n", [1, 4, 8])
def test_dryrun_multichip(n):
    mod = _load_entry()
    mod.dryrun_multichip(n)


def test_dryrun_parent_never_initializes_backend(monkeypatch):
    """Round-3 regression (MULTICHIP_r03.json ok=false): the parent called
    jax.devices() before re-exec'ing, so a wedged TPU relay (libtpu version
    mismatch) failed a check that is *about* a virtual CPU mesh.  The parent
    must now reach the scrubbed-CPU child without any backend init — here
    jax.devices raising simulates the poisoned relay."""
    mod = _load_entry()
    monkeypatch.delenv("_SDT_MULTICHIP_REEXEC", raising=False)

    def _poisoned(*a, **k):
        raise RuntimeError("simulated wedged relay: libtpu version mismatch")

    monkeypatch.setattr(mod.jax, "devices", _poisoned)
    mod.dryrun_multichip(2)  # must not raise: child probes its own devices


def test_scrubbed_cpu_env_drops_every_relay_hook(monkeypatch):
    monkeypatch.setenv("PYTHONPATH", "/root/.axon_site:/root/repo")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("TPU_SKIP_MDS_QUERY", "1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    mod = _load_entry()
    env = mod._scrubbed_cpu_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_SDT_MULTICHIP_REEXEC"] == "1"
    assert not any(k.startswith(("AXON", "PALLAS_AXON", "TPU_", "LIBTPU"))
                   for k in env)
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert env["XLA_FLAGS"].count("host_platform_device_count") == 1
    assert "axon_site" not in env["PYTHONPATH"]


def test_bench_multichip_dry_run():
    """benchmarks/bench_multichip.py --dry-run must rehearse the DP
    throughput + SP latency flow green on the virtual CPU mesh (the
    day->1-chip command for BASELINE config 5; VERDICT r4 next #6)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "benchmarks",
                                      "bench_multichip.py"),
         "--devices", "4", "--dry-run"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "PYTHONPATH": repo})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PASS" in proc.stdout
    assert '"rehearsal": true' in proc.stdout
