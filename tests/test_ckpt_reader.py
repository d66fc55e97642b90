"""Torch-free .ckpt reader vs torch.load, plus the malicious-pickle probe."""

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
