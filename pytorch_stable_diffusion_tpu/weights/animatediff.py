"""AnimateDiff motion-module checkpoint ingestion (models/motion.py).

Behavior target: the published ``guoyww/AnimateDiff`` ``mm_sd_v15[_v2]``
state dicts — per module
``{down_blocks.{l}|up_blocks.{l}|mid_block}.motion_modules.{j}
.temporal_transformer.*`` with GroupNorm ``norm``, Linear
``proj_in``/``proj_out``, and ``transformer_blocks.{b}`` carrying TWO
``attention_blocks`` (bias-free to_q/k/v, biased to_out.0, a fixed
``pos_encoder.pe`` buffer), paired ``norms``, the GEGLU ``ff`` and
``ff_norm``.

Re-keyed onto our stage universe ("enc_{stage}" / "dec_{stage}" /
"mid"): down level l block j == encoder stage l*(num_res+1)+j (the v2
topology has one module after EVERY res(+attn) stage, all four levels);
up level l block j == decoder stage l*(num_res+1)+j (both deepest-
first); exact two-way coverage enforced.  Returns ``(tree, max_len)``
with ``max_len`` read from the pe buffers (the trained temporal
window — 32 for v2).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from ..models.config import UNetConfig


def motion_site_plan(cfg: UNetConfig) -> Dict[str, str]:
    """checkpoint module prefix -> our stage key."""
    plan = {}
    n_levels = len(cfg.ch_mults)
    for lvl in range(n_levels):
        start = sum(cfg.num_res_blocks + (1 if i < n_levels - 1 else 0)
                    for i in range(lvl))
        for j in range(cfg.num_res_blocks):
            plan[f"down_blocks.{lvl}.motion_modules.{j}"] = \
                f"enc_{start + j}"
    for lvl in range(n_levels):
        start = lvl * (cfg.num_res_blocks + 1)
        for j in range(cfg.num_res_blocks + 1):
            plan[f"up_blocks.{lvl}.motion_modules.{j}"] = \
                f"dec_{start + j}"
    plan["mid_block.motion_modules.0"] = "mid"
    return plan


def convert_motion_module(state: Dict[str, np.ndarray],
                          cfg: UNetConfig) -> Tuple[Dict, int]:
    """-> ({site_key: module params}, max_len).  A checkpoint WITHOUT a
    mid module (v1) simply omits the "mid" site."""
    sd = {k: np.asarray(v) for k, v in state.items()}
    # the fixed sinusoidal pe buffers ((1, max_len, C)) are recomputed at
    # apply time; consume them and report the trained temporal window
    max_len = 0
    for k in list(sd):
        if k.endswith("pos_encoder.pe"):
            max_len = max(max_len, int(sd.pop(k).shape[-2]))

    def take(key):
        if key not in sd:
            raise ValueError(f"motion module missing {key!r}")
        return np.asarray(sd.pop(key), np.float32)

    def take_lin(prefix, bias=True):
        p = {"kernel": take(prefix + ".weight").T.copy()}
        if bias:
            p["bias"] = take(prefix + ".bias")
        return p

    def take_n(prefix):
        return {"scale": take(prefix + ".weight"),
                "bias": take(prefix + ".bias")}

    prefixes = sorted({m.group(1) for k in sd
                       if (m := re.match(
                           r"(.+?\.motion_modules\.\d+)\.", k))})
    plan = motion_site_plan(cfg)
    tree = {}
    for pref in prefixes:
        if pref not in plan:
            raise ValueError(f"unexpected motion module {pref!r} for this "
                             "UNet topology")
        t = pref + ".temporal_transformer."
        mod = {"norm": take_n(t + "norm"),
               "proj_in": take_lin(t + "proj_in"),
               "proj_out": take_lin(t + "proj_out"),
               "blocks": []}
        b = 0
        while f"{t}transformer_blocks.{b}.ff_norm.weight" in sd:
            tb = f"{t}transformer_blocks.{b}."
            blk = {}
            for ai in (0, 1):
                a = f"{tb}attention_blocks.{ai}."
                blk[f"attn{ai + 1}"] = {
                    "q": take_lin(a + "to_q", bias=False),
                    "k": take_lin(a + "to_k", bias=False),
                    "v": take_lin(a + "to_v", bias=False),
                    "out": take_lin(a + "to_out.0"),
                }
                blk[f"norm{ai + 1}"] = take_n(f"{tb}norms.{ai}")
            blk["ff_proj"] = take_lin(tb + "ff.net.0.proj")
            blk["ff_out"] = take_lin(tb + "ff.net.2")
            blk["ff_norm"] = take_n(tb + "ff_norm")
            mod["blocks"].append(blk)
            b += 1
        if not mod["blocks"]:
            raise ValueError(f"{pref}: no transformer_blocks found")
        tree[plan[pref]] = mod
    if sd:
        raise ValueError(f"unconsumed motion keys: {sorted(sd)[:4]}...")
    if not tree:
        raise ValueError("no motion_modules.* keys found")
    return tree, (max_len or 24)


def load_motion_module(path: str, cfg: UNetConfig) -> Tuple[Dict, int]:
    if path.endswith(".safetensors"):
        from .convert import load_state_dict

        return convert_motion_module(load_state_dict(path), cfg)
    from .ckpt_reader import load_torch_object

    obj = load_torch_object(path)
    if isinstance(obj, dict) and "state_dict" in obj \
            and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return convert_motion_module(obj, cfg)
