"""The per-test watchdog (tests/conftest.py pytest_runtest_protocol hook).

Round-3 lesson: a stale expected-raise probe became a silent multi-hour
512^2 CPU generation and stalled the suite twice.  The watchdog bounds
every test: a soft SIGALRM fails the test with a traceback, and a
faulthandler hard backstop (1.5x + 60 s) exits a process wedged inside
an XLA C call.  This file proves the soft tier end-to-end by running a
deliberately-hung test in a real pytest subprocess under this repo's
conftest, and unit-checks the marker/env plumbing.
"""

import os
import signal
import subprocess
import sys
import textwrap

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soft_watchdog_fails_hung_test(tmp_path):
    # The generated file must live under tests/ so the repo conftest (and
    # its hook) governs it; a unique name keeps collection isolated.
    victim = os.path.join(_REPO, "tests", "_watchdog_victim_tmp.py")
    with open(victim, "w") as fh:
        fh.write(textwrap.dedent("""\
            import time
            import pytest

            @pytest.mark.timeout(2)
            def test_sleeps_past_the_watchdog():
                time.sleep(60)
        """))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", victim, "-q", "-x",
             "-p", "no:cacheprovider"],
            cwd=_REPO, env=env, capture_output=True, text=True, timeout=300)
    finally:
        os.unlink(victim)
    out = proc.stdout + proc.stderr
    assert proc.returncode != 0, out
    assert "TimeoutError" in out, out
    assert "test watchdog" in out, out
    # Soft tier: the run FAILED in seconds with a traceback, it did not
    # hang until the 60 s sleep finished and it did not hard-exit.
    assert "1 failed" in out, out


def test_marker_overrides_and_zero_disables(request):
    # Plumbing check on the live hook: the current test runs under the
    # default ceiling with a real itimer armed by the wrapper.
    assert request.node.get_closest_marker("timeout") is None
    remaining = signal.getitimer(signal.ITIMER_REAL)[0]
    assert remaining > 0, "watchdog itimer is not armed for this test"
    default = float(os.environ.get("SDT_TEST_TIMEOUT", "900"))
    assert remaining <= default


@pytest.mark.timeout(0)
def test_zero_marker_disables_watchdog():
    assert signal.getitimer(signal.ITIMER_REAL)[0] == 0.0
