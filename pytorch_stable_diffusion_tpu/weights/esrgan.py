"""ESRGAN / RealESRGAN checkpoint ingestion (models/esrgan.py).

Handles BOTH published namings with exact coverage:
  * new-arch (BasicSR / RealESRGAN): ``conv_first.weight``,
    ``body.{i}.rdb{1,2,3}.conv{1..5}.weight``, ``conv_body``,
    ``conv_up1/2``, ``conv_hr``, ``conv_last`` — sometimes nested under
    ``params``/``params_ema``;
  * old-arch (original ESRGAN / most A1111 "ESRGAN_4x" files):
    ``model.0.weight``, ``model.1.sub.{i}.RDB{j}.conv{k}.0.weight``,
    ``model.1.sub.{N}.weight`` (trunk), ``model.3/6/8/10.weight``.

The architecture config (features, block count, growth, scale) is
INFERRED from the tensor shapes, so any size variant loads.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

from ..models.esrgan import ESRGANConfig


def _hwio(w):
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0).copy()


def _conv(sd, key):
    return {"kernel": _hwio(sd.pop(key + ".weight")),
            "bias": np.asarray(sd.pop(key + ".bias"), np.float32)}


def _scale_for_in(c_in: int) -> int:
    if c_in % 48 == 0 and c_in != 3:
        return 1
    if c_in % 12 == 0:
        return 2
    return 4


def convert_esrgan(state: Dict[str, np.ndarray]):
    """-> (params, ESRGANConfig)."""
    sd = {k: v for k, v in state.items()}
    for nest in ("params_ema", "params"):
        if nest in sd and isinstance(sd[nest], dict):
            sd = dict(sd[nest])
            break
    if "conv_first.weight" in sd:
        return _convert_new(sd)
    if "model.0.weight" in sd:
        return _convert_old(sd)
    raise ValueError(f"unrecognized ESRGAN layout (keys like "
                     f"{sorted(sd)[:3]}...)")


def _convert_new(sd):
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"body\.(\d+)\.", k)))
    w_first = np.asarray(sd["conv_first.weight"])
    nf, c_in = w_first.shape[0], w_first.shape[1]
    gc = np.asarray(sd["body.0.rdb1.conv1.weight"]).shape[0]
    out_ch = np.asarray(sd["conv_last.weight"]).shape[0]
    cfg = ESRGANConfig(in_channels=3, out_channels=out_ch, features=nf,
                       num_blocks=n_blocks, growth=gc,
                       scale=_scale_for_in(c_in))
    params = {"conv_first": _conv(sd, "conv_first"),
              "body": [], "conv_body": _conv(sd, "conv_body"),
              "conv_up1": _conv(sd, "conv_up1"),
              "conv_up2": _conv(sd, "conv_up2"),
              "conv_hr": _conv(sd, "conv_hr"),
              "conv_last": _conv(sd, "conv_last")}
    for i in range(n_blocks):
        blk = {}
        for j in (1, 2, 3):
            blk[f"rdb{j}"] = {
                f"conv{k}": _conv(sd, f"body.{i}.rdb{j}.conv{k}")
                for k in range(1, 6)}
        params["body"].append(blk)
    if sd:
        raise ValueError(f"unconsumed ESRGAN keys: {sorted(sd)[:4]}...")
    return params, cfg


def _convert_old(sd):
    subs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"model\.1\.sub\.(\d+)\.", k))})
    n_blocks = subs[-1]  # the last sub entry is the trunk conv
    w_first = np.asarray(sd["model.0.weight"])
    nf, c_in = w_first.shape[0], w_first.shape[1]
    gc = np.asarray(sd["model.1.sub.0.RDB1.conv1.0.weight"]).shape[0]
    out_ch = np.asarray(sd["model.10.weight"]).shape[0]
    cfg = ESRGANConfig(in_channels=3, out_channels=out_ch, features=nf,
                       num_blocks=n_blocks, growth=gc,
                       scale=_scale_for_in(c_in))
    params = {"conv_first": _conv(sd, "model.0"),
              "body": [],
              "conv_body": _conv(sd, f"model.1.sub.{n_blocks}"),
              "conv_up1": _conv(sd, "model.3"),
              "conv_up2": _conv(sd, "model.6"),
              "conv_hr": _conv(sd, "model.8"),
              "conv_last": _conv(sd, "model.10")}
    for i in range(n_blocks):
        blk = {}
        for j in (1, 2, 3):
            blk[f"rdb{j}"] = {
                f"conv{k}": _conv(sd, f"model.1.sub.{i}.RDB{j}.conv{k}.0")
                for k in range(1, 6)}
        params["body"].append(blk)
    if sd:
        raise ValueError(f"unconsumed ESRGAN keys: {sorted(sd)[:4]}...")
    return params, cfg


def load_esrgan(path: str):
    """Weight file (.pth torch pickle or .safetensors) -> (params, cfg)."""
    if path.endswith(".safetensors"):
        from .convert import load_state_dict

        return convert_esrgan(load_state_dict(path))
    from .ckpt_reader import load_torch_object

    return convert_esrgan(load_torch_object(path))
