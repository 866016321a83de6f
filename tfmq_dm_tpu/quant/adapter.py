"""Model adapter protocol for the reconstruction/calibration engine.

The reference walks a mutated nn.Module tree to find reconstruction units
(calibration.py:56-84) and relies on module identity for everything. Here
a model exposes an explicit :class:`ModelAdapter`:

- ``units``: the ordered reconstruction units (TIB first, then blocks and
  standalone layers in module order);
- ``unit_fwd``: ONE module-level function per unit *kind* taking role-keyed
  params/state, so jit's compilation cache is shared across all units of
  the same kind and shape class (the reference re-runs eager torch per
  block; we compile the 20k-iter Adam loop once per shape class);
- ``forward``: the full-model forward threading a QuantCtx (for asym input
  capture, FSC init/EMA passes, and inference).

Everything in the static dataclasses is hashable so it can be a jit
static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

from .policy import QuantPolicy
from .quantizer import QCfg


@dataclasses.dataclass(frozen=True)
class RoleCfg:
    """Static per-role quantization config inside a unit forward."""

    role: str
    w_cfg: Optional[QCfg] = None   # None => weight stays FP
    a_cfg: Optional[QCfg] = None
    aq: bool = False               # input act-quant enabled for this role
    train: bool = False            # alpha (weight phase) / delta (act phase)
    # trainable in this unit's reconstruction


@dataclasses.dataclass(frozen=True)
class UnitSpec:
    """One reconstruction unit (cf. recon_model DFS, calibration.py:56-84).

    ``layers`` maps role -> full layer name for weight layers;
    ``act_sites`` maps role -> full site name for standalone act sites.
    ``extra`` carries static kind-specific data (e.g. TIB channel count).
    """

    name: str
    kind: str
    layers: Tuple[Tuple[str, str], ...]       # (role, full_name)
    act_sites: Tuple[Tuple[str, str], ...] = ()
    recon: bool = True
    extra: tuple = ()

    def role_of(self, full_name: str) -> Optional[str]:
        for role, fn in self.layers:
            if fn == full_name:
                return role
        return None


@dataclasses.dataclass(eq=False)  # hash by identity (jit static arg)
class ModelAdapter:
    policy: QuantPolicy
    units: List[UnitSpec]
    # forward(params, ctx, *cali_batch) -> model output (ctx may be None)
    forward: Callable
    # unit_fwd(kind: str static, role_cfgs: tuple static, extra: tuple
    #          static, uparams, wstate, astate, inputs, soft: bool static,
    #          use_aq: bool static) -> output array or tuple
    unit_fwd: Callable
    # extract_uparams(params, unit) -> role-keyed param dict
    extract_uparams: Callable

    def unit_by_name(self, name: str) -> UnitSpec:
        for u in self.units:
            if u.name == name:
                return u
        raise KeyError(name)

    def role_cfgs(self, unit: UnitSpec,
                  train_roles: frozenset) -> Tuple[RoleCfg, ...]:
        """Build the static per-role config tuple for a unit from the
        policy (bits/flags) + which roles are trainable."""
        out = []
        for role, full in unit.layers:
            pol = self.policy.get(full)
            if pol is None:
                out.append(RoleCfg(role=role))
                continue
            out.append(RoleCfg(
                role=role,
                w_cfg=pol.w_cfg if pol.wq else None,
                a_cfg=pol.a_cfg,
                aq=pol.aq,
                train=role in train_roles))
        for role, full in unit.act_sites:
            pol = self.policy.get(full)
            out.append(RoleCfg(role=role, a_cfg=None if pol is None
                               else pol.a_cfg,
                               aq=bool(pol and pol.aq)))
        return tuple(out)

    def default_train_roles(self, unit: UnitSpec) -> frozenset:
        """Roles whose AdaRound alpha trains during this unit's recon:
        recon-enabled weight layers that are NOT quant_emb (temb_proj /
        emb_layers are reconstructed by the TIB instead —
        reconstruction.py:110-112,138), except inside the TIB itself where
        quant_emb layers DO train (reconstruction.py:246-258)."""
        roles = []
        for role, full in unit.layers:
            pol = self.policy.get(full)
            if pol is None or not pol.wq or not pol.recon:
                continue
            if unit.kind != "tib" and pol.quant_emb:
                continue
            roles.append(role)
        return frozenset(roles)
