"""Torch-free .ckpt reader vs torch.load, plus the malicious-pickle probe."""

import io
import pickle
import zipfile

import numpy as np
import pytest
import torch

from pytorch_stable_diffusion_tpu.weights.ckpt_reader import load_torch_ckpt


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    rng = np.random.RandomState(0)
    base = torch.as_tensor(rng.randn(6, 8).astype(np.float32))
    sd = {
        "a.weight": torch.as_tensor(rng.randn(4, 3, 3, 3).astype(np.float32)),
        "b.bias": torch.as_tensor(rng.randn(7).astype(np.float16)),
        "c.long": torch.arange(5),
        "d.noncontig": base.t(),              # transposed view (strided)
        "e.slice": base[1:4, 2:7],            # offset + strided
        "f.scalarish": torch.tensor(3.25),
    }
    path = str(tmp_path_factory.mktemp("ck") / "test.ckpt")
    torch.save({"state_dict": sd, "global_step": 470000}, path)
    return path, sd


def test_matches_torch_load(ckpt):
    path, sd = ckpt
    ours = load_torch_ckpt(path)
    ref = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    tensor_keys = {k for k, v in sd.items() if v.dim() > 0 or True}
    for k in ref:
        got = ours[k]
        expect = ref[k].numpy()
        assert got.shape == expect.shape, k
        assert got.dtype == expect.dtype, k
        np.testing.assert_array_equal(got, expect, err_msg=k)
    assert "global_step" not in ours  # non-tensor entries dropped


def test_refuses_arbitrary_code(tmp_path):
    """A checkpoint carrying an os.system reduce payload must be rejected."""

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    path = tmp_path / "evil.ckpt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_ckpt(str(path))


def test_rejects_legacy_format(tmp_path):
    path = tmp_path / "legacy.ckpt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("something_else.bin", b"\x00")
    with pytest.raises(ValueError, match="legacy|data.pkl"):
        load_torch_ckpt(str(path))


def _write_ckpt_with_geometry(path, offset, size, stride, buf_elems=4):
    """Craft a torch-zip ckpt whose single f32 tensor rebuilds with the given
    (offset, size, stride) against a buf_elems-element storage — the
    attacker-controlled fields the reader must bounds-check."""
    marker = object()

    class Rebuild:
        def __reduce__(self):
            return (torch._utils._rebuild_tensor_v2,
                    (marker, offset, size, stride, False, None))

    buf = io.BytesIO()

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if obj is marker:
                return ("storage", torch.FloatStorage, "0", "cpu", buf_elems)
            return None

    P(buf, protocol=2).dump({"x": Rebuild()})
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/data/0", b"\x00" * (4 * buf_elems))


def test_geometry_within_bounds_ok(tmp_path):
    path = str(tmp_path / "ok.ckpt")
    _write_ckpt_with_geometry(path, 0, (2, 2), (2, 1))
    assert load_torch_ckpt(path)["x"].shape == (2, 2)


@pytest.mark.parametrize("offset,size,stride,msg", [
    (2, (4,), (1,), "out of bounds"),        # contiguous overrun
    (0, (2, 2), (1000, 1), "out of bounds"),  # strided overrun
    (0, (2,), (-1,), "negative"),             # negative stride
    (-1, (2,), (1,), "negative"),             # negative offset
    (4, (), (), "out of bounds"),             # 0-d past the end
])
def test_geometry_out_of_bounds_rejected(tmp_path, offset, size, stride, msg):
    """Attacker-controlled offset/size/stride must not read past the storage
    buffer (heap disclosure / segfault via as_strided)."""
    path = str(tmp_path / "oob.ckpt")
    _write_ckpt_with_geometry(path, offset, size, stride)
    with pytest.raises(ValueError, match=msg):
        load_torch_ckpt(path)


def test_load_state_dict_never_retries_refused_pickles(tmp_path):
    """A payload the restricted reader refuses must NOT be re-loaded through
    torch.load's full pickle VM (that would defeat the whole protection)."""
    from pytorch_stable_diffusion_tpu.weights import convert

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    path = tmp_path / "evil.ckpt"
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        convert.load_state_dict(str(path))
    # even with the opt-in flag: refusals are not "legacy format"
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        convert.load_state_dict(str(path), allow_unsafe_fallback=True)


def test_load_state_dict_legacy_needs_opt_in(tmp_path):
    """Pre-zip legacy torch files load only via torch.load (full pickle), so
    they require the explicit allow_unsafe_fallback opt-in."""
    from pytorch_stable_diffusion_tpu.weights import convert

    path = str(tmp_path / "legacy.ckpt")
    torch.save({"w": torch.ones(2)}, path, _use_new_zipfile_serialization=False)
    with pytest.raises(ValueError, match="allow_unsafe_fallback"):
        convert.load_state_dict(path)
    out = convert.load_state_dict(path, allow_unsafe_fallback=True)
    np.testing.assert_array_equal(out["w"], np.ones(2, np.float32))


def test_end_to_end_convert(tiny_cfg, tiny_state_dict, tmp_path):
    """Full CompVis ingestion through the torch-free reader."""
    from pytorch_stable_diffusion_tpu.core.pytree import flatten
    from pytorch_stable_diffusion_tpu.weights import convert

    path = str(tmp_path / "tiny.ckpt")
    torch.save({"state_dict": {k: torch.as_tensor(np.asarray(v).copy())
                               for k, v in tiny_state_dict.items()}}, path)
    params = convert.convert(load_torch_ckpt(path), tiny_cfg)
    got = flatten(params)
    assert len(got) > 100
