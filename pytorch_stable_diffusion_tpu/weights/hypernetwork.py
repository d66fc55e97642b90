"""A1111 hypernetworks: small residual MLPs transforming the cross-attention
context separately for the k and v projections.

No reference analog (capability beyond ``/root/reference/sd``); semantics
follow A1111's ``modules/hypernetworks/hypernetwork.py``: the ``.pt`` file
maps each context width (int key, e.g. 768) to a pair of
``HypernetworkModule`` state dicts (k-net, v-net), each a ``linear.*``
Sequential of Linear (and optionally LayerNorm) modules, applied as
``x + net(x) * strength``.  Inside cross-attention:
``k = to_k(k_net(ctx))``, ``v = to_v(v_net(ctx))`` — plumbed here as a
``(ctx_k, ctx_v)`` tuple through ``ops/attention.apply``.

Files load through the restricted torch unpickler
(``ckpt_reader.load_torch_object`` — no pickle code execution).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: activation_func values A1111 offers at hypernetwork creation
ACTIVATIONS = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "leakyrelu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softsign": jax.nn.soft_sign,
}

_META_KEYS = ("step", "name", "layer_structure", "activation_func",
              "is_layer_norm", "add_layer_norm", "use_dropout",
              "activate_output", "last_layer_dropout", "weight_initialization",
              "sd_checkpoint", "sd_checkpoint_name", "optional_info",
              "dropout_structure", "optimizer_name", "optimizer_state_dict")


def _parse_module(sd: Dict[str, np.ndarray]) -> List[dict]:
    """One HypernetworkModule state dict -> ordered module list.

    ``linear.{i}.weight`` 2-D = Linear (stored torch (out, in); transposed
    to our x @ W layout), 1-D = LayerNorm.  Sequential indices of
    activation/dropout modules are parameterless, so index gaps are
    expected and the sort order alone fixes application order.
    """
    idxs = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("linear.")})
    if not idxs:
        raise ValueError("hypernetwork module has no linear.* keys")
    mods: List[dict] = []
    for i in idxs:
        w = np.asarray(sd[f"linear.{i}.weight"], np.float32)
        b = sd.get(f"linear.{i}.bias")
        b = None if b is None else np.asarray(b, np.float32)
        if w.ndim == 2:
            m = {"kernel": w.T}
            if b is not None:
                m["bias"] = b
            mods.append(m)
        elif w.ndim == 1:
            if b is None:
                raise ValueError(f"LayerNorm linear.{i} missing bias")
            mods.append({"ln_scale": w, "ln_bias": b})
        else:
            raise ValueError(f"unexpected linear.{i}.weight ndim {w.ndim}")
    return mods


def load_hypernetwork(obj_or_path) -> Tuple[dict, Tuple[str, bool]]:
    """Load an A1111 hypernetwork ``.pt`` (path or the already-unpickled
    dict) -> ``(tree, (activation, activate_output))``.

    ``tree[str(dim)]["k"|"v"]`` is the module list for that context width
    (string keys: jax.export serialization rejects non-str dict keys); the
    static metadata tuple keys the compiled pipeline variant.
    """
    obj = obj_or_path
    if isinstance(obj_or_path, str):
        from .ckpt_reader import load_torch_object

        obj = load_torch_object(obj_or_path)
    if not isinstance(obj, dict):
        raise ValueError("hypernetwork file did not unpickle to a dict")
    act = (obj.get("activation_func") or "linear").lower()
    if act not in ACTIVATIONS:
        raise ValueError(f"unsupported hypernetwork activation {act!r} "
                         f"(known: {sorted(ACTIVATIONS)})")
    activate_output = bool(obj.get("activate_output", False))
    tree: Dict[str, dict] = {}
    for key, val in obj.items():
        if isinstance(key, int):
            if not (isinstance(val, (tuple, list)) and len(val) == 2):
                raise ValueError(f"size {key}: expected (k_sd, v_sd) pair")
            tree[str(key)] = {"k": _parse_module(dict(val[0])),
                              "v": _parse_module(dict(val[1]))}
        elif key not in _META_KEYS:
            raise ValueError(f"unexpected hypernetwork key {key!r}")
    if not tree:
        raise ValueError("hypernetwork has no size entries")
    return tree, (act, activate_output)


def _run_module(mods: List[dict], x, activation: str, activate_output: bool):
    """``x + net(x)`` with the activation applied after every Linear except
    (unless activate_output) the last — A1111's HypernetworkModule."""
    act = ACTIVATIONS[activation]
    h = x
    n_linear = sum(1 for m in mods if "kernel" in m)
    seen = 0
    for m in mods:
        if "kernel" in m:
            h = h @ m["kernel"].astype(h.dtype)
            if "bias" in m:
                h = h + m["bias"].astype(h.dtype)
            seen += 1
            if seen < n_linear or activate_output:
                h = act(h)
        else:  # LayerNorm (add_layer_norm=True nets)
            mu = h.mean(axis=-1, keepdims=True)
            var = ((h - mu) ** 2).mean(axis=-1, keepdims=True)
            h = (h - mu) * jax.lax.rsqrt(var + 1e-5)
            h = h * m["ln_scale"].astype(h.dtype) + m["ln_bias"].astype(h.dtype)
    return x + h


def apply_hypernetwork(tree: dict, context, strength, *, activation: str,
                       activate_output: bool):
    """context (..., D) -> (ctx_k, ctx_v); ``strength`` is traced (A1111's
    multiplier scales the residual: ``x + net(x) * strength``)."""
    d = context.shape[-1]
    layers = tree.get(str(d))
    if layers is None:
        raise ValueError(f"hypernetwork has no entry for context width {d} "
                         f"(has {sorted(tree)})")

    def run(mods):
        base = context.astype(jnp.float32)
        full = _run_module(mods, base, activation, activate_output)
        return (base + strength * (full - base)).astype(context.dtype)

    return run(layers["k"]), run(layers["v"])
