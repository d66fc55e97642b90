"""Driver entry points: entry() traces; dryrun_multichip executes on the
8-virtual-device mesh."""

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
