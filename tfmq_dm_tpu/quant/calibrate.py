"""Calibration orchestrator — the functional ``cali_model``.

Re-specifies /root/reference/quant/calibration.py:45-155:

  1. weight-quantizer init (per-channel MSE on the weights themselves);
  2. TIAR reconstruction, unit by unit in module order (TIB first);
  3. FSC per-timestep activation calibration;
  4. artifact save.

plus ``load_cali_model`` (calibration.py:158-224) as a trivial artifact
load — no Parameter juggling, no dummy forwards.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax

from .adapter import ModelAdapter
from .artifact import load_artifact, save_artifact
from .fsc import fsc_calibrate
from .recon import ReconHP, init_weight_qparams, reconstruct

logger = logging.getLogger(__name__)


def cali_model(adapter: ModelAdapter, params,
               w_cali_data: Tuple[jax.Array, ...],
               a_cali_data: Optional[Tuple[jax.Array, ...]] = None,
               *, hp: ReconHP = ReconHP(), use_aq: bool = False,
               running_stat: bool = True, path: Optional[str] = None,
               key: Optional[jax.Array] = None,
               w_scaler: str = "mse", act_scaler: str = "mse",
               meta: Optional[dict] = None,
               capture_batch_size: int = 128,
               mesh=None, resume_dir: Optional[str] = None,
               log=None, recon_stats: Optional[dict] = None):
    """Full PTQ calibration. ``w_cali_data``: sample-major tuple (x, t[,c]);
    ``a_cali_data``: group-major tuple (G, N, ...) for FSC (required when
    ``use_aq``). Returns (wstate, astate).

    ``mesh``: data-parallel reconstruction over a device mesh (the
    reference's cali_model_multi). ``resume_dir``: per-unit checkpoints,
    resumable after a crash (unlike the all-or-nothing reference).
    ``log(unit_name, losses_or_None)``: overrides the default per-unit
    loss logging (losses is the full per-iter trace, so callers can
    persist auditable convergence curves). ``recon_stats``: optional
    dict collecting the per-unit do-no-harm guard records."""
    if key is None:
        key = jax.random.PRNGKey(0)
    logger.info("calibrating: weight qparam init (%s)", w_scaler)
    wstate = init_weight_qparams(adapter.policy, params, scaler=w_scaler)

    if log is None:
        def log(unit, losses):
            if losses is None:
                logger.info("recon %-24s resumed from checkpoint", unit)
            else:
                logger.info("recon %-24s loss %.6f -> %.6f", unit,
                            float(losses[0]), float(losses[-1]))

    key, k1, k2 = jax.random.split(key, 3)
    logger.info("calibrating: TIAR reconstruction over %d units",
                len(adapter.units))
    wstate = reconstruct(adapter, params, w_cali_data, wstate, hp, k1,
                         capture_batch_size=capture_batch_size, log=log,
                         mesh=mesh, resume_dir=resume_dir,
                         stats=recon_stats)

    astate = None
    if use_aq:
        assert a_cali_data is not None
        logger.info("calibrating: FSC over %d timestep groups",
                    a_cali_data[0].shape[0])
        astate = fsc_calibrate(adapter, params, wstate, a_cali_data, k2,
                               running_stat=running_stat,
                               act_scaler=act_scaler)

    if path:
        save_artifact(path, wstate, astate, meta)
        logger.info("calibration artifact saved to %s", path)
    return wstate, astate


def load_cali_model(path: str) -> Tuple[Dict, Optional[Dict], dict]:
    """Load a calibration artifact -> (wstate, astate, meta)."""
    return load_artifact(path)
