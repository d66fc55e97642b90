"""Checkpoint save/export round-trips (the write path the reference lacks)."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.core.pytree import flatten
from pytorch_stable_diffusion_tpu.weights import convert, save


def test_safetensors_export_roundtrip(tiny_cfg, tiny_models, tmp_path):
    path = str(tmp_path / "export.safetensors")
    save.save_safetensors(tiny_models, tiny_cfg, path)
    sd = convert.load_state_dict(path)
    params = convert.convert(sd, tiny_cfg)
    a, b = flatten(tiny_models), flatten(params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_native_roundtrip(tiny_models, tmp_path):
    path = str(tmp_path / "native.npz")
    save.save_native(tiny_models, path)
    loaded = save.load_native(tiny_models, path)
    a, b = flatten(tiny_models), flatten(loaded)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_native_strict_coverage(tiny_models, tmp_path):
    path = str(tmp_path / "native.npz")
    save.save_native(tiny_models["clip"], path)
    with pytest.raises(KeyError):
        save.load_native(tiny_models, path)  # wrong structure -> strict error
