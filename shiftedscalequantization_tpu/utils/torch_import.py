"""Import pretrained torch checkpoints into raw graph params.

Replaces the reference's hubconf downloads (trash/hubconf.py:16-68) with an
offline converter: given a torch state dict (or a .pth/.pth.tar path) and a
model's torch_key_map, produce the raw params pytree (conv weights in OIHW,
linear in (O, I) — identical layout to torch, so no transposition) with BN
stats attached for fold_bn.
"""
from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ..graph import Graph, iter_units


def _to_np(t):
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_state_dict(path: str) -> dict:
    """Load a torch checkpoint file to a {key: np.ndarray} dict."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # the BRECQ mobilenetv2.pth.tar release wraps the flat state dict as
    # {'model': sd} (reference trash/hubconf.py:38)
    if isinstance(sd, dict) and "model" in sd \
            and not any(hasattr(v, "shape") for v in sd.values()):
        sd = sd["model"]
    return {k.removeprefix("module."): _to_np(v) for k, v in sd.items()}


def params_from_state_dict(graph: Graph, key_map: Mapping[str, tuple],
                           sd: Mapping[str, np.ndarray],
                           dtype=jnp.float32) -> dict:
    """Build raw params {unit: {'w','b'?,'bn'?}} from a torch state dict."""
    params = {}
    for u in iter_units(graph):
        conv_key, bn_key = key_map[u.name]
        p = {"w": jnp.asarray(_to_np(sd[f"{conv_key}.weight"]), dtype)}
        if f"{conv_key}.bias" in sd:
            p["b"] = jnp.asarray(_to_np(sd[f"{conv_key}.bias"]), dtype)
        if bn_key is not None:
            bn = {
                "mean": jnp.asarray(_to_np(sd[f"{bn_key}.running_mean"]), dtype),
                "var": jnp.asarray(_to_np(sd[f"{bn_key}.running_var"]), dtype),
            }
            if f"{bn_key}.weight" in sd:
                bn["gamma"] = jnp.asarray(_to_np(sd[f"{bn_key}.weight"]), dtype)
                bn["beta"] = jnp.asarray(_to_np(sd[f"{bn_key}.bias"]), dtype)
            p["bn"] = bn
        params[u.name] = p
    return params
