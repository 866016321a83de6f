"""Convert torch checkpoints (reference format) to our JAX param pytrees.

Pure relabel/transpose: our param names equal the torch ``state_dict``
module paths, so conversion needs no model-specific logic beyond layout:

- linear  : torch (out, in)       -> ours (in, out)        [transpose]
- conv2d  : torch (O, I, kh, kw)  -> ours (kh, kw, I, O)   [(2,3,1,0)]
- norms   : weight/bias           -> scale/bias

torch is only imported lazily (CPU wheel, used host-side at load time —
never inside compiled code).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _to_np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def convert_state_dict(torch_sd: Mapping[str, "object"],
                       layer_iter) -> Dict[str, dict]:
    """Build our flat param dict from a torch state_dict.

    ``layer_iter`` yields (kind, name, shape) like
    ``models.ddim_unet.iter_layers``; kinds: "linear", "conv*", "norm".
    """
    params: Dict[str, dict] = {}
    for kind, name, shape in layer_iter:
        if kind in ("norm", "lnorm"):
            params[name] = {
                "scale": jnp.asarray(_to_np(torch_sd[f"{name}.weight"])),
                "bias": jnp.asarray(_to_np(torch_sd[f"{name}.bias"])),
            }
            continue
        if kind == "embed":
            params[name] = {
                "w": jnp.asarray(_to_np(torch_sd[f"{name}.weight"]))}
            continue
        w = _to_np(torch_sd[f"{name}.weight"])
        if kind == "conv1d":          # (O, I, 1) -> (I, O)
            w = w[:, :, 0].T
        elif kind.startswith("linear"):
            w = w.T
        else:  # conv (O,I,kh,kw) -> (kh,kw,I,O)
            w = w.transpose(2, 3, 1, 0)
        entry = {"w": jnp.asarray(w)}
        bkey = f"{name}.bias"
        if bkey in torch_sd:
            entry["b"] = jnp.asarray(_to_np(torch_sd[bkey]))
        params[name] = entry
    return params


def export_state_dict(params: Dict[str, dict],
                      layer_iter) -> Dict[str, np.ndarray]:
    """Exact inverse of convert_state_dict (kind-aware)."""
    out: Dict[str, np.ndarray] = {}
    for kind, name, shape in layer_iter:
        p = params[name]
        if kind in ("norm", "lnorm"):
            out[f"{name}.weight"] = np.asarray(p["scale"])
            out[f"{name}.bias"] = np.asarray(p["bias"])
            continue
        if kind == "embed":
            out[f"{name}.weight"] = np.asarray(p["w"])
            continue
        w = np.asarray(p["w"])
        if kind == "conv1d":
            w = w.T[:, :, None]
        elif kind.startswith("linear"):
            w = w.T
        else:
            w = w.transpose(3, 2, 0, 1)
        out[f"{name}.weight"] = w
        if "b" in p:
            out[f"{name}.bias"] = np.asarray(p["b"])
    return out


def params_to_torch_names(params: Dict[str, dict]) -> Dict[str, np.ndarray]:
    """Inverse relabel (for exporting / cross-checking)."""
    out = {}
    for name, entry in params.items():
        if "scale" in entry:
            out[f"{name}.weight"] = np.asarray(entry["scale"])
            out[f"{name}.bias"] = np.asarray(entry["bias"])
        else:
            w = np.asarray(entry["w"])
            if w.ndim == 2:
                out[f"{name}.weight"] = w.T
            else:
                out[f"{name}.weight"] = w.transpose(3, 2, 0, 1)
            if "b" in entry:
                out[f"{name}.bias"] = np.asarray(entry["b"])
    return out
