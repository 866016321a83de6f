"""Versioned calibration artifact (save/load).

Replaces the reference's torch.save dict with Parameter-promotion warts
(calibration.py:99-154, 175-223 — delta/zero_point temporarily wrapped in
nn.Parameter purely to serialize) with an explicit flat-key npz + JSON
meta:

  w::<layer>::delta|zp|alpha      weight quantizer state
  fsc::<site>::delta|zp           per-timestep-group act state, (G, ...)
  __meta__                        JSON: version, bits, model config, notes
"""

from __future__ import annotations

import io
import json
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def save_artifact(path: str, wstate: Dict, astate: Optional[Dict] = None,
                  meta: Optional[dict] = None) -> None:
    arrays = {}
    for layer, st in wstate.items():
        for k, v in st.items():
            if v is not None:
                arrays[f"w::{layer}::{k}"] = np.asarray(v)
    if astate:
        for site, st in astate.items():
            for k, v in st.items():
                arrays[f"fsc::{site}::{k}"] = np.asarray(v)
    m = dict(meta or {})
    m["format_version"] = FORMAT_VERSION
    arrays["__meta__"] = np.frombuffer(
        json.dumps(m).encode("utf-8"), dtype=np.uint8)
    np.savez(path, **arrays)


def load_artifact(path: str) -> Tuple[Dict, Optional[Dict], dict]:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    wstate: Dict = {}
    astate: Dict = {}
    for key in data.files:
        if key == "__meta__":
            continue
        kind, name, field = key.split("::")
        tgt = wstate if kind == "w" else astate
        tgt.setdefault(name, {})[field] = jnp.asarray(data[key])
    return wstate, (astate or None), meta
