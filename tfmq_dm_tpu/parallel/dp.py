"""Data-parallel reconstruction over a device mesh — compat surface.

The actual implementation lives in `quant.recon`: `_recon_run` takes an
optional ``mesh`` and runs the SAME scanned Adam program under
`shard_map` over the mesh's "dp" axis (samples sharded, `lax.pmean` on
grads each iteration). That single driver is the TPU-native rebuild of
the reference's forked multi-GPU path (cali_model_multi,
calibration.py:228-389 + per-iter ``link.allreduce``,
reconstruction.py:72-75) — and unlike the reference's fork (and this
repo's round-1 fork), the mesh path keeps Fisher losses, per-unit resume
checkpoints, and host-offload chunking.

These wrappers keep the round-1 public names importable.
"""

from __future__ import annotations

from jax.sharding import Mesh

from ..quant.adapter import ModelAdapter, UnitSpec
from ..quant.recon import ReconHP, reconstruct, reconstruct_unit


def reconstruct_unit_dp(mesh: Mesh, adapter: ModelAdapter, unit: UnitSpec,
                        params, wstate, inputs, outputs, hp: ReconHP,
                        key, fgrads=None):
    """One unit's reconstruction sharded over ``mesh`` — delegates to the
    unified `recon.reconstruct_unit`."""
    return reconstruct_unit(adapter, unit, params, wstate, inputs,
                            outputs, hp, key, fgrads, mesh=mesh)


def reconstruct_dp(mesh: Mesh, adapter: ModelAdapter, params, cali_data,
                   wstate, hp: ReconHP, key, *,
                   capture_batch_size: int = 128, log=None,
                   resume_dir=None):
    """Mesh-sharded sequential reconstruction — delegates to the unified
    `recon.reconstruct`."""
    return reconstruct(adapter, params, cali_data, wstate, hp, key,
                       capture_batch_size=capture_batch_size, log=log,
                       mesh=mesh, resume_dir=resume_dir)
