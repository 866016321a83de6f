"""QuantCtx — the functional replacement for the reference's QuantModel.

A QuantCtx is threaded through a model's ``apply``; every quantizable call
site consults it. It carries:

- ``policy``: static per-layer config (bits, enable flags) — trace-time only
- ``wstate``: traced pytree ``{layer: {"delta","zp"[, "alpha"]}}``
- ``astate``: traced pytree ``{site: {"delta","zp"}}`` (FSC stores a
  timestep-batched version and slices it per step before building the ctx)
- static mode flags ``use_wq`` / ``use_aq`` (the reference's
  set_quant_state, quant_model.py:86-92)
- ``soft_units``: units currently optimizing AdaRound with soft rounding
- a ``tape`` for capturing unit inputs/outputs (replaces forward hooks +
  StopForwardException, data_utill.py:76-169 — XLA dead-code-eliminates
  everything downstream of the requested capture when the jitted wrapper
  only returns the tape)
- activation-calibration modes: ``act_init`` computes fresh delta/zp from
  the current batch at each site *in forward order* (matching the
  reference's lazy init under a quantized prefix, calibration.py:125-128)
  and ``act_ema`` performs the running-stat EMA update
  (quant_layer.py:229-244) — both write their results into ``out_astate`` /
  ``out_arange`` Python dicts which the jitted wrapper returns.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, Optional

import jax.numpy as jnp

from .policy import QuantPolicy
from .quantizer import (QCfg, fake_quant, init_qparams, broadcast_channel,
                        ema_range_update, qparams_from_range)
from .adaround import adaround_fq


class QuantCtx:
    def __init__(self,
                 policy: QuantPolicy,
                 wstate: Optional[dict] = None,
                 astate: Optional[dict] = None,
                 use_wq: bool = False,
                 use_aq: bool = False,
                 soft_units: FrozenSet[str] = frozenset(),
                 capture: Optional[FrozenSet[str]] = None,
                 act_mode: Optional[str] = None,  # None|"init"|"ema"
                 arange: Optional[dict] = None,
                 act_scaler: str = "mse",
                 ema_momentum: float = 0.95,
                 unit_of: Optional[Dict[str, str]] = None,
                 deploy: Optional[dict] = None,
                 act_out_dtype=None,
                 override: Optional[dict] = None,
                 flash: bool = False,
                 capture_tags: Optional[FrozenSet[str]] = None):
        self.policy = policy
        self.wstate = wstate or {}
        self.astate = astate or {}
        self.use_wq = use_wq
        self.use_aq = use_aq
        self.soft_units = soft_units
        self.capture = capture  # None => no tape; set of unit names (or {"*"})
        # None => tape both "in" and "out"; else only the listed tags —
        # the shared FP-output precapture (recon.precapture_fp_outs)
        # tapes every unit's "out" in ONE pass and halving the tape this
        # way halves its device-memory footprint
        self.capture_tags = capture_tags
        self.tape: Dict[str, object] = {}
        self.act_mode = act_mode
        self.arange = arange or {}
        self.out_astate: Dict[str, dict] = {}
        self.out_arange: Dict[str, tuple] = {}
        self.act_scaler = act_scaler
        self.ema_momentum = ema_momentum
        # layer name -> recon unit name (for soft/hard AdaRound selection)
        self.unit_of = unit_of or {}
        # deployment mode: {layer: IntWeight} => call sites execute int8
        # ops instead of fake-quant + fp conv (quant/deploy.py)
        self.deploy = deploy
        self.act_out_dtype = act_out_dtype
        # {unit: value} — substitute a unit's output (Fisher grads)
        self.override = override
        # opt-in to the fused flash-attention kernel (forward-only
        # inference contexts; see ops/attention.py dispatch rules)
        self.flash = flash
        # when set (a dict), deployed conv sites record their static
        # geometry {layer: (in_hw, stride, pads)} — used by
        # deploy.specialize_maps under jax.eval_shape to precompute
        # border maps without running the model
        self.shape_tape = None

    # ---------------- weight path ----------------

    def qweight(self, name: str, w):
        if not self.use_wq:
            return w
        pol = self.policy.get(name)
        if pol is None or not pol.wq:
            return w
        st = self.wstate.get(name)
        if st is None:
            return w
        cfg: QCfg = pol.w_cfg
        if "alpha" in st:
            soft = self.unit_of.get(name) in self.soft_units
            return adaround_fq(w, st["delta"], st["zp"], st["alpha"], cfg,
                               soft=soft)
        delta = broadcast_channel(st["delta"], w.shape)
        zp = broadcast_channel(st["zp"], w.shape)
        return fake_quant(w, delta, zp, cfg)

    # ---------------- activation path ----------------

    def qact(self, name: str, x):
        pol = self.policy.get(name)
        if pol is None or not pol.aq:
            return x
        cfg: QCfg = pol.a_cfg
        if self.act_mode == "init":
            if not self.use_aq:
                return x
            delta, zp = init_qparams(x, cfg, scaler=self.act_scaler)
            self.out_astate[name] = {"delta": delta, "zp": zp}
            # seed the EMA range with the raw batch min/max, matching the
            # leaf_param init (quant_layer.py:206-207)
            self.out_arange[name] = (jnp.min(x), jnp.max(x))
            return fake_quant(x, delta, zp, cfg)
        if self.act_mode == "ema":
            if not self.use_aq:
                return x
            x_min, x_max = self.arange[name]
            x_min, x_max = ema_range_update(x, x_min, x_max,
                                            self.ema_momentum)
            delta, zp = qparams_from_range(x_min, x_max, cfg)
            self.out_arange[name] = (x_min, x_max)
            self.out_astate[name] = {"delta": delta, "zp": zp}
            return fake_quant(x, delta, zp, cfg)
        if not self.use_aq:
            return x
        st = self.astate.get(name)
        if st is None:
            return x
        return fake_quant(x, st["delta"], st["zp"], cfg)

    # ---------------- capture tape ----------------

    def tap(self, unit: str, tag: str, value):
        """Record a unit-boundary value; for "out" tags, an entry in
        ``override`` replaces the unit's output in the live dataflow
        (used for Fisher grad capture: d loss / d block_out, replacing
        the backward hooks of data_utill.py:172-256). Returns the value
        that should flow onward."""
        if self.override is not None and tag == "out" and \
                unit in self.override:
            value = self.override[unit]
        if self.capture is not None and \
                ("*" in self.capture or unit in self.capture) and \
                (self.capture_tags is None or tag in self.capture_tags):
            self.tape[f"{unit}::{tag}"] = value
        return value


def null_ctx(policy: QuantPolicy) -> QuantCtx:
    """A ctx with everything off — pure FP forward."""
    return QuantCtx(policy)
