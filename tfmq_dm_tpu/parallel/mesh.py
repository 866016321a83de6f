"""Device mesh utilities.

TPU-native replacement for the reference's linklink/NCCL shim
(/root/reference/linklink/__init__.py:21-59, dist_helper.py:60-73): no
process groups, no rank plumbing — a `jax.sharding.Mesh` plus named
shardings, with XLA inserting collectives over ICI/DCN.

Axes:
- "dp": data parallel over calibration samples / sampling batch (the
  reference's only strategy, calibration.py:269-282);
- "tp": tensor parallel over output channels of the big conv/linear
  weights (beyond-reference scaling for large UNets).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), (dp, tp, len(devices))
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Place a pytree with its leading (sample) axis sharded over dp."""
    spec = P(*([None] * axis + ["dp"]))
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_params_tp(mesh: Mesh, params, min_channels: int = 128):
    """Shard large weights over "tp" along their output-channel (last)
    axis; small tensors and norms stay replicated. GSPMD propagates the
    activation shardings from these seeds."""
    def place(a):
        if a.ndim >= 2 and a.shape[-1] >= min_channels \
                and a.shape[-1] % mesh.shape["tp"] == 0:
            spec = P(*([None] * (a.ndim - 1) + ["tp"]))
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(place, params)
