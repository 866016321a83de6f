"""Reconstruction engine: TIAR block/layer/TIB reconstruction as jitted
`lax.scan` Adam loops.

Re-specifies the reference's reconstruction drivers
(/root/reference/quant/reconstruction.py:13-318) and the capture machinery
(data_utill.py:13-169) TPU-first:

- block I/O capture is a pure jitted forward returning the QuantCtx tape —
  XLA dead-code-eliminates everything downstream of the tapped unit, which
  is the compiler-native version of the reference's
  ``StopForwardException`` early abort;
- the ``asym`` input capture (quantized-prefix inputs vs FP outputs,
  data_utill.py:146-157) runs both forwards inside one jit;
- the 20k-iteration Adam loop over AdaRound alphas is ONE `lax.scan`
  program, compiled once per (unit kind, shape class) thanks to role-keyed
  states — the reference re-executes eager torch per iteration;
- loss = Lp reconstruction + temperature-decayed rounding regularizer
  gated by warmup, exactly as LossFunc/LossFuncTimeEmbedding
  (reconstruction_util.py:13-173).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)

from .adapter import ModelAdapter, UnitSpec
from .adaround import init_alpha, linear_temp_decay, round_regularizer
from .context import QuantCtx
from .quantizer import init_qparams, lp_loss


@dataclasses.dataclass(frozen=True)
class ReconHP:
    """Reconstruction hyperparameters (defaults = the entry scripts',
    ddim/runners/diffusion.py:296-304 / txt2img.py:473-481)."""

    iters: int = 20000
    batch_size: int = 32
    w: float = 0.01
    b_start: float = 20.0
    b_end: float = 2.0
    warmup: float = 0.2
    lr_alpha: float = 1e-3   # torch.optim.Adam default (reconstruction.py:41)
    lr_delta: float = 4e-5   # act phase (reconstruction.py:45)
    p: float = 2.0
    asym: bool = True
    use_aq: bool = False
    rloss: str = "mse"       # mse | fisher_diag | fisher_full
    # (RLOSS enum, reconstruction_util.py:10; entry flows use mse)
    # skip a unit's whole Adam loop when its nearest-rounding hard loss
    # is already below this floor (0 = never skip); pairs with the
    # do-no-harm guard in reconstruct_unit
    loss_floor: float = 0.0


def init_weight_qparams(policy, params, scaler: str = "mse") -> Dict:
    """Per-channel (delta, zp) for every wq-enabled layer, from the weight
    tensor itself — the effect of the reference's dummy init forward
    (calibration.py:87-92), which only ever feeds wqtizers their weights."""
    wstate = {}
    for name in policy.weight_layers():
        pol = policy.get(name)
        if not pol.wq:
            continue
        delta, zp = init_qparams(params[name]["w"], pol.w_cfg, scaler=scaler)
        wstate[name] = {"delta": delta, "zp": zp}
    return wstate


# ---------------------------------------------------------------------------
# I/O capture
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("adapter", "unit_name",
                                             "asym", "use_aq"))
def _capture_batch(adapter: ModelAdapter, unit_name: str, asym: bool,
                   use_aq: bool, params, wstate, astate, batch):
    ctx_fp = QuantCtx(adapter.policy, capture=frozenset({unit_name}))
    adapter.forward(params, ctx_fp, *batch)
    out = ctx_fp.tape[f"{unit_name}::out"]
    if asym:
        ctx_q = QuantCtx(adapter.policy, wstate=wstate, astate=astate,
                         use_wq=True, use_aq=use_aq,
                         capture=frozenset({unit_name}))
        adapter.forward(params, ctx_q, *batch)
        inp = ctx_q.tape[f"{unit_name}::in"]
    else:
        inp = ctx_fp.tape[f"{unit_name}::in"]
    return inp, out


def _cast_tree(tree, dtype):
    """Cast every float32 leaf (works under jit — used to ship host
    caches as f16 over the slow tunnel link and restore f32 on
    device; f16's 2^-11 relative step is 10-25x below even the w8a8
    reconstruction residual, so the objective is unaffected)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and x.dtype in (jnp.float32, jnp.float16) else x, tree)


def _f32(tree):
    return _cast_tree(tree, jnp.float32)


@functools.partial(jax.jit, static_argnames=("adapter", "unit_name",
                                             "use_aq", "cast_f16"))
def _capture_in_batch(adapter: ModelAdapter, unit_name: str, use_aq: bool,
                      params, wstate, astate, batch,
                      cast_f16: bool = False):
    """Quantized-prefix forward taping ONLY the unit's input — the asym
    half of ``_capture_batch`` when the FP outputs were already captured
    by the shared ``precapture_fp_outs`` pass (the other half).
    ``cast_f16``: cast on DEVICE so the host fetch moves half the
    bytes (host-offloaded caches only)."""
    ctx_q = QuantCtx(adapter.policy, wstate=wstate, astate=astate,
                     use_wq=True, use_aq=use_aq,
                     capture=frozenset({unit_name}),
                     capture_tags=frozenset({"in"}))
    adapter.forward(params, ctx_q, *batch)
    out = ctx_q.tape[f"{unit_name}::in"]
    return _cast_tree(out, jnp.float16) if cast_f16 else out


@functools.partial(jax.jit, static_argnames=("adapter", "unit_names",
                                             "tags", "cast_f16"))
def _capture_many_batch(adapter: ModelAdapter, unit_names: frozenset,
                        tags: frozenset, params, batch,
                        cast_f16: bool = False):
    """ONE FP forward taping the requested tags of EVERY listed unit.
    The reference re-runs a full forward per block to cache its outputs
    (save_inout, data_utill.py:13-51, called once per recon unit); FP
    outputs do not depend on the quantized prefix, so one pass serves
    all units — with asym capture this halves the model forwards per
    calibration (the order-dependent quantized-prefix INPUT captures
    remain per-unit by necessity)."""
    ctx = QuantCtx(adapter.policy, capture=unit_names, capture_tags=tags)
    adapter.forward(params, ctx, *batch)
    tape = {k: v for k, v in ctx.tape.items()}
    return _cast_tree(tape, jnp.float16) if cast_f16 else tape


# host-RAM budget for the shared FP-output cache; above this the engine
# falls back to per-unit fused capture (the one-pass cache would not fit)
FP_OUT_HOST_BUDGET = 48 << 30


def precapture_fp_outs(adapter: ModelAdapter, unit_names, params,
                       cali_data, *, batch_size: int = 128):
    """One streamed FP pass over the cali set caching every listed
    unit's output on the host: ``{unit: pytree of np arrays}``. Feed the
    per-unit entry to ``capture_unit_io(..., fp_out=...)`` to skip its
    FP forward."""
    names = frozenset(unit_names)
    if not names:
        return {}
    n = cali_data[0].shape[0]
    parts = {}
    for i in range(0, n, batch_size):
        batch = tuple(x[i:i + batch_size] for x in cali_data)
        tape = _capture_many_batch(adapter, names,
                                   frozenset({"out"}), params, batch,
                                   cast_f16=True)
        tape = jax.tree.map(lambda x: np.asarray(x), tape)
        for k, v in tape.items():
            parts.setdefault(k, []).append(v)
    return {k.removesuffix("::out"):
            jax.tree.map(lambda *xs: np.concatenate(xs), *v)
            for k, v in parts.items()}


def capture_unit_io(adapter: ModelAdapter, unit: UnitSpec, params,
                    cali_data: Tuple[jax.Array, ...], wstate, astate=None,
                    *, asym: bool = True, use_aq: bool = False,
                    batch_size: int = 128, to_host: bool = False,
                    fp_out=None):
    """Cache (inputs, outputs) of one unit over the calibration set
    (save_inout, data_utill.py:13-51): inputs from the quantized-prefix
    forward when ``asym``, outputs always from the FP forward.
    ``to_host``: stream the cache to host numpy — the reference's
    keep_gpu=False offload for units whose cached I/O exceeds device
    memory (calibration.py:62-67, data_utill.py:39-41).
    ``fp_out``: this unit's FP outputs precomputed by the shared
    ``precapture_fp_outs`` pass (host numpy) — with ``asym`` the FP
    forward is then skipped entirely and only the quantized-prefix
    input capture runs."""
    if unit.kind.startswith("tib"):
        # TIB's I/O is its own forward on (t[, y]): inputs are the raw cali
        # timesteps, outputs the FP projection tuple (save_inout(block,
        # block, ...), reconstruction.py:287)
        uparams = adapter.extract_uparams(params, unit)
        rc = adapter.role_cfgs(unit, frozenset())
        fp_rc = tuple(dataclasses.replace(r, w_cfg=None, aq=False)
                      for r in rc)
        inputs = (cali_data[1],)  # the TIB consumes only t
        outputs = adapter.unit_fwd(unit.kind, fp_rc, unit.extra, uparams,
                                   {}, {}, inputs, False, False)
        return inputs, outputs
    astate = astate or {}
    n = cali_data[0].shape[0]
    cat = np.concatenate if to_host else jnp.concatenate

    def _host(x):  # host caches are f16 (see _cast_tree rationale)
        x = np.asarray(x)
        return x.astype(np.float16) if x.dtype == np.float32 else x

    if fp_out is not None and asym:
        ins = []
        for i in range(0, n, batch_size):
            batch = tuple(x[i:i + batch_size] for x in cali_data)
            inp = _capture_in_batch(adapter, unit.name, use_aq, params,
                                    wstate, astate, batch,
                                    cast_f16=to_host)
            if to_host:
                inp = jax.tree.map(lambda x: np.asarray(x), inp)
            ins.append(inp)
        inputs = jax.tree.map(lambda *xs: cat(xs), *ins)
        outputs = fp_out if to_host \
            else jax.tree.map(jnp.asarray, fp_out)
        return inputs, outputs
    ins, outs = [], []
    for i in range(0, n, batch_size):
        batch = tuple(x[i:i + batch_size] for x in cali_data)
        inp, out = _capture_batch(adapter, unit.name, asym, use_aq,
                                  params, wstate, astate, batch)
        if to_host:
            inp = jax.tree.map(_host, inp)
            out = jax.tree.map(_host, out)
        ins.append(inp)
        outs.append(out)
    inputs = jax.tree.map(lambda *xs: cat(xs), *ins)
    outputs = jax.tree.map(lambda *xs: cat(xs), *outs)
    return inputs, outputs


@functools.partial(jax.jit, static_argnames=("adapter", "unit_name",
                                             "use_aq"))
def _grad_batch(adapter: ModelAdapter, unit_name: str, use_aq: bool,
                params, wstate_sub, astate, batch):
    """d KL(softmax(fp) || softmax(quant)) / d unit_output, with the model
    quantized up to and including the unit (GetLayerGrad,
    data_utill.py:191-256). The unit output is substituted via the
    QuantCtx override instead of a backward hook."""
    ctx_cap = QuantCtx(adapter.policy, wstate=wstate_sub, astate=astate,
                       use_wq=True, use_aq=use_aq,
                       capture=frozenset({unit_name}))
    adapter.forward(params, ctx_cap, *batch)
    u_out0 = ctx_cap.tape[f"{unit_name}::out"]
    out_fp = adapter.forward(params, None, *batch)
    p_fp = jax.nn.softmax(out_fp, axis=-1)
    log_pfp = jax.nn.log_softmax(out_fp, axis=-1)

    def loss(u_out):
        ctx = QuantCtx(adapter.policy, wstate=wstate_sub, astate=astate,
                       use_wq=True, use_aq=use_aq,
                       override={unit_name: u_out})
        out_q = adapter.forward(params, ctx, *batch)
        log_q = jax.nn.log_softmax(out_q, axis=-1)
        # F.kl_div(log_q, p_fp, reduction='batchmean')
        return jnp.sum(p_fp * (log_pfp - log_q)) / out_q.shape[0]

    return jax.grad(loss)(u_out0)


def capture_unit_grads(adapter: ModelAdapter, unit: UnitSpec, params,
                       cali_data, wstate, astate=None, *,
                       use_aq: bool = False, batch_size: int = 32):
    """save_grad (data_utill.py:54-74): cached |grad| + 1 over the cali
    set, for the FISHER reconstruction losses."""
    order = [u.name for u in adapter.units]
    upto = set()
    for name in order:
        u = adapter.unit_by_name(name)
        upto.update(full for _, full in u.layers)
        if name == unit.name:
            break
    wstate_sub = {k: v for k, v in wstate.items() if k in upto}
    astate = astate or {}
    n = cali_data[0].shape[0]
    gs = []
    for i in range(0, n, batch_size):
        batch = tuple(x[i:i + batch_size] for x in cali_data)
        gs.append(_grad_batch(adapter, unit.name, use_aq, params,
                              wstate_sub, astate, batch))
    return jnp.abs(jnp.concatenate(gs)) + 1.0


# ---------------------------------------------------------------------------
# Scanned reconstruction loop
# ---------------------------------------------------------------------------

def _merge_alpha(wstate_roles, alphas):
    merged = dict(wstate_roles)
    for role, a in alphas.items():
        merged[role] = dict(merged[role])
        merged[role]["alpha"] = a
    return merged


def _rec_loss(pred, tgt, p, rloss="mse", grads=None):
    """LossFunc rec term (reconstruction_util.py:51-61): Lp summed over
    channel / FISHER_DIAG / FISHER_FULL weighted by cached |grad|+1."""
    if rloss == "fisher_diag":
        return jnp.mean(jnp.sum((pred - tgt) ** 2 * grads ** 2, axis=-1))
    if rloss == "fisher_full":
        a = jnp.abs(pred - tgt)
        g = jnp.abs(grads)
        bd = jnp.sum(a * g, axis=tuple(range(1, a.ndim)),
                     keepdims=True)
        return jnp.mean(bd * a * g) / 100.0
    ls = [lp_loss(a, b, p=p) for a, b in
          zip(jax.tree.leaves(pred), jax.tree.leaves(tgt))]
    return functools.reduce(jnp.add, ls)


@functools.partial(
    jax.jit,
    static_argnames=("unit_fwd", "kind", "role_cfgs", "extra", "hp",
                     "n_iters", "mesh"))
def _recon_run(unit_fwd, kind: str, role_cfgs: tuple, extra: tuple,
               hp: ReconHP, uparams, wstate_fixed, alphas, inputs,
               outputs, key, fgrads=None, opt_state=None,
               iter0: int = 0, n_iters: Optional[int] = None,
               mesh=None):
    """The full weight-phase optimization for one unit: scan of
    {minibatch -> forward(soft) -> loss -> Adam} (reconstruction.py:63-78,
    182-198, 290-303). ``fgrads``: cached Fisher grads (|g|+1) when
    hp.rloss != mse.

    ``opt_state``/``iter0``/``n_iters`` allow CONTINUATION: run a
    segment of the schedule (temp decay and warmup stay relative to the
    full ``hp.iters``) — used by the host-offloaded chunked driver.

    ``mesh``: the SAME program runs data-parallel over the mesh's "dp"
    axis (the reference's cali_model_multi, calibration.py:228-389):
    inputs/outputs/fgrads arrive sharded on the sample axis, each device
    draws a local minibatch, and the per-iteration
    ``link.allreduce(param.grad)`` (reconstruction.py:72-75) becomes a
    `lax.pmean` inside the scan, riding ICI.

    Returns (trained alphas, opt_state, per-iter losses)."""
    opt = optax.adam(hp.lr_alpha)
    if opt_state is None:
        opt_state = opt.init(alphas)
    if n_iters is None:
        n_iters = hp.iters
    loss_start = hp.warmup * hp.iters
    ndev = 1 if mesh is None else mesh.shape["dp"]

    def loss_fn(a, wfixed, binp, bout, bg, count):
        wstate = _merge_alpha(wfixed, a)
        pred = unit_fwd(kind, role_cfgs, extra, uparams, wstate, {},
                        binp, True, hp.use_aq)
        rec = _rec_loss(pred, bout, hp.p, hp.rloss, bg)
        b = linear_temp_decay(count, hp.iters, hp.warmup, hp.b_start,
                              hp.b_end)
        reg = functools.reduce(
            jnp.add, [round_regularizer(v, b) for v in a.values()])
        reg = jnp.where(count < loss_start, 0.0, hp.w * reg)
        return rec + reg, rec

    def body(alphas, opt_state, wfixed, inputs, outputs, fgrads, key,
             iter0):
        # under shard_map these are LOCAL shapes; hp.batch_size is the
        # global minibatch, split evenly across devices
        n = jax.tree.leaves(inputs)[0].shape[0]
        bs = max(1, min(hp.batch_size, n * ndev) // ndev)
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))

        def step(carry, i):
            a, ost, k = carry
            k, k1 = jax.random.split(k)
            idx = jax.random.permutation(k1, n)[:bs]
            binp = _f32(jax.tree.map(lambda x: x[idx], inputs))
            bout = _f32(jax.tree.map(lambda x: x[idx], outputs))
            bg = None if fgrads is None else fgrads[idx]
            (loss, rec), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(a, wfixed, binp, bout, bg, i + 1.0)
            if mesh is not None:
                grads = jax.lax.pmean(grads, "dp")
                rec = jax.lax.pmean(rec, "dp")
            updates, ost = opt.update(grads, ost)
            a = optax.apply_updates(a, updates)
            return (a, ost, k), rec

        # iter0 is traced: equal-length segments share a compiled program
        (alphas, opt_state, _), losses = jax.lax.scan(
            step, (alphas, opt_state, key),
            jnp.arange(n_iters, dtype=jnp.float32) + iter0)
        return alphas, opt_state, losses

    iter0 = jnp.float32(iter0)
    if mesh is None:
        return body(alphas, opt_state, wstate_fixed, inputs, outputs,
                    fgrads, key, iter0)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    data = P("dp")
    run = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), data, data,
                  P() if fgrads is None else data, P(), P()),
        out_specs=(P(), P(), P()),
        # vma checking stays ON: every replicated output is provably
        # device-invariant (grads/losses go through pmean before any
        # state update; the per-device RNG key is dropped)
        check_vma=True)
    return run(alphas, opt_state, wstate_fixed, inputs, outputs, fgrads,
               key, iter0)


@functools.partial(jax.jit, static_argnames=("unit_fwd", "kind",
                                             "role_cfgs", "extra", "hp",
                                             "use_aq"))
def _hard_loss_batch(unit_fwd, kind, role_cfgs, extra, hp: ReconHP,
                     use_aq: bool, uparams, wstate_roles, ast, binp,
                     bout, bg=None):
    """Hard-rounding (inference-mode, soft=False) reconstruction loss of
    one cached-I/O batch — the quantity the deployed model actually
    realizes, unlike the annealed soft loss the Adam loop optimizes."""
    binp, bout = _f32(binp), _f32(bout)
    pred = unit_fwd(kind, role_cfgs, extra, uparams, wstate_roles, ast,
                    binp, False, use_aq)
    return _rec_loss(pred, bout, hp.p, hp.rloss, bg)


# a host-offloaded guard eval re-uploads the cache through the (slow)
# host<->device link; cap the transfer at ~1 GiB via an even stride
# across the cali set (sample order is timestep-major, so a prefix
# would bias toward early timesteps), never below a 512-row floor.
# Both guard evals use the identical subset, which is what the
# keep/revert comparison requires; at >=512 i.i.d. rows the mean-loss
# standard error is a few percent while guard separations are ~2-5x.
HARD_EVAL_MAX_BYTES = 1 << 30
HARD_EVAL_MIN_ROWS = 512


def _hard_eval(unit_fwd, kind, role_cfgs, extra, hp: ReconHP, uparams,
               wstate_roles, inputs, outputs, fgrads=None, ast=None,
               use_aq=None, batch: int = 256) -> float:
    """Mean hard-rounding loss over the cached I/O, batched (two of
    these per unit cost two forwards — negligible next to the Adam
    loop). Host-offloaded caches are stride-subsampled to
    ``HARD_EVAL_MAX_BYTES`` of transfer."""
    if use_aq is None:
        use_aq = hp.use_aq
    n = jax.tree.leaves(inputs)[0].shape[0]
    if isinstance(jax.tree.leaves(inputs)[0], np.ndarray):
        max_rows = max(HARD_EVAL_MIN_ROWS,
                       HARD_EVAL_MAX_BYTES
                       // max(1, _bytes_per_row(inputs, outputs)))
        if n > max_rows:
            idx = np.linspace(0, n - 1, max_rows).astype(np.int64)
            inputs = jax.tree.map(lambda x: x[idx], inputs)
            outputs = jax.tree.map(lambda x: x[idx], outputs)
            if fgrads is not None:
                fgrads = np.asarray(fgrads)[idx]
            n = max_rows
    tot, cnt = 0.0, 0
    for i in range(0, n, batch):
        binp = jax.tree.map(lambda x: jnp.asarray(x[i:i + batch]),
                            inputs)
        bout = jax.tree.map(lambda x: jnp.asarray(x[i:i + batch]),
                            outputs)
        bg = None if fgrads is None else jnp.asarray(
            np.asarray(fgrads)[i:i + batch])
        loss = _hard_loss_batch(unit_fwd, kind, role_cfgs, extra, hp,
                                use_aq, uparams, wstate_roles,
                                ast or {}, binp, bout, bg)
        b = jax.tree.leaves(binp)[0].shape[0]
        tot += float(loss) * b
        cnt += b
    return tot / max(cnt, 1)


# device-memory budget for one unit's cached recon I/O; above this the
# capture streams to host numpy and the Adam schedule runs in chunks
# (the reference's keep_gpu heuristics, calibration.py:62-67).
# 3 GiB, not more: the cache shares 16 GiB HBM with params, the Adam
# working set, and the capture forward's live activations — an 8 GiB
# threshold OOMed on the 25600-sample ref20k pool (gate log,
# RESOURCE_EXHAUSTED in capture_unit_io's fp_out upload)
HOST_OFFLOAD_BYTES = 3 << 30
_HOST_CHUNK_BYTES = 2 << 30

# When a unit is checkpointable (``partial_path``), its Adam schedule runs
# as segments of at most this many iterations: each segment is a SEPARATE
# device program (the shared tunnel TPU kills workers whose single program
# runs for minutes — the big 32x32 decoder units at the full 20k-iter
# budget were un-finishable in one window), and the partial optimizer
# state is persisted after every segment so a worker crash resumes
# mid-unit instead of restarting the unit.
RESUME_SEG_ITERS = 2500


def _save_partial(path: str, alphas, opt_state, it0: int, key) -> None:
    """Atomically persist a mid-unit optimization state."""
    import os
    leaves = jax.tree.leaves((alphas, opt_state))
    tmp = path + ".tmp.npz"  # np.savez appends .npz to bare names
    np.savez(tmp, __it0=np.int64(it0), __key=np.asarray(key),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    os.replace(tmp, path)


def _load_partial(path: str, alphas, opt_state):
    """Restore (alphas, opt_state, it0, key) saved by ``_save_partial``.
    ``alphas``/``opt_state`` provide the pytree structure."""
    data = np.load(path)
    treedef = jax.tree.structure((alphas, opt_state))
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(treedef.num_leaves)]
    alphas, opt_state = jax.tree.unflatten(treedef, leaves)
    return alphas, opt_state, int(data["__it0"]), jnp.asarray(data["__key"])


def _bytes_per_row(inputs, outputs) -> int:
    leaves = jax.tree.leaves(inputs) + jax.tree.leaves(outputs)
    return sum(int(np.prod(x.shape[1:])) * x.dtype.itemsize
               for x in leaves)


def _prep_unit_states(adapter, unit, params, wstate):
    """Split one unit's wstate into (role_cfgs, uparams, fixed role
    states, trainable alphas) — alphas initialized from the weight's
    fractional part on first touch (uaq2adar, calibration.py:19-42)."""
    train_roles = adapter.default_train_roles(unit)
    if not train_roles:
        return None
    role_cfgs = adapter.role_cfgs(unit, train_roles)
    uparams = adapter.extract_uparams(params, unit)
    wstate_roles = {}
    alphas = {}
    for role, full in unit.layers:
        st = wstate.get(full)
        if st is None:
            continue
        wstate_roles[role] = st
        if role in train_roles:
            alphas[role] = st.get("alpha")
            if alphas[role] is None:
                alphas[role] = init_alpha(params[full]["w"], st["delta"])
    fixed = {r: {k: v for k, v in st.items() if not (r in alphas and
                                                     k == "alpha")}
             for r, st in wstate_roles.items()}
    return role_cfgs, uparams, fixed, alphas


def _shard_samples(mesh, inputs, outputs, fgrads):
    """Shard cached I/O over the mesh's "dp" sample axis, truncating to a
    device multiple (cali samples are i.i.d. generated latents, so
    dropping <ndev tail rows is neutral — unlike padding-by-duplication,
    which double-weights the wrapped rows)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    ndev = mesh.shape["dp"]
    n = jax.tree.leaves(inputs)[0].shape[0]
    n_keep = max(ndev, (n // ndev) * ndev)
    if n_keep > n:
        raise ValueError(
            f"need at least {ndev} cali samples for a {ndev}-device dp "
            f"mesh; got {n}")
    if n_keep < n:
        logger.info("dp recon: truncating %d -> %d samples (multiple of "
                    "%d devices)", n, n_keep, ndev)
    spec = NamedSharding(mesh, P("dp"))
    put = lambda a: jax.device_put(jnp.asarray(a[:n_keep]), spec)
    inputs = jax.tree.map(put, inputs)
    outputs = jax.tree.map(put, outputs)
    if fgrads is not None:
        fgrads = put(fgrads)
    return inputs, outputs, fgrads


def reconstruct_unit(adapter: ModelAdapter, unit: UnitSpec, params,
                     wstate, inputs, outputs, hp: ReconHP, key,
                     fgrads=None, mesh=None, partial_path=None,
                     stats: Optional[dict] = None):
    """Run weight-phase reconstruction for one unit; returns updated
    wstate (alphas written back under full layer names) and the loss
    trace. ``mesh``: run the Adam loop data-parallel over the mesh's
    "dp" axis (one driver for single-device and sharded reconstruction —
    the reference forks cali_model vs cali_model_multi).

    ``partial_path``: mid-unit checkpointing — the schedule runs as
    ≤``RESUME_SEG_ITERS``-iteration device programs with (alphas,
    opt_state, iter, key) persisted after each, so a TPU-worker crash
    resumes inside the unit (and no single device program runs long
    enough to trip the shared tunnel's watchdog).

    Do-no-harm guard (improves on reconstruction.py:63-78, which keeps
    the final alphas unconditionally): the HARD-rounding loss over the
    cached I/O is evaluated for nearest rounding (no alpha) and for the
    trained alphas, and the better one is kept — round-3 w8a8 gate logs
    showed AdaRound optimization leaving every unit WORSE than nearest
    rounding, and the annealed soft loss the loop optimizes is not the
    loss the deployed model realizes. ``hp.loss_floor`` > 0 skips the
    whole Adam loop when nearest rounding is already below the floor.
    ``stats``: optional dict collecting per-unit guard records."""
    import os

    prep = _prep_unit_states(adapter, unit, params, wstate)
    if prep is None:
        return wstate, None
    role_cfgs, uparams, fixed, alphas = prep

    on_host = isinstance(jax.tree.leaves(inputs)[0], np.ndarray)
    if mesh is not None and not on_host:
        # shard/truncate ONCE, before the nearest-rounding eval, so both
        # do-no-harm guard evals and the Adam loop see the IDENTICAL
        # sample set (a guard comparing losses over different sample
        # sets can flip on borderline units). Single-process meshes
        # only: _hard_eval's host-side slicing needs addressable arrays.
        inputs, outputs, fgrads = _shard_samples(mesh, inputs, outputs,
                                                 fgrads)

    # nearest-rounding baseline, expressed as fresh init_alpha alphas so
    # (a) it is EXACTLY the state a revert stores and (b) both guard
    # evals share one compiled program (same pytree structure)
    base_alphas = {role: init_alpha(params[full]["w"],
                                    wstate[full]["delta"])
                   for role, full in unit.layers if role in alphas}
    hard_nearest = _hard_eval(adapter.unit_fwd, unit.kind, role_cfgs,
                              unit.extra, hp, uparams,
                              _merge_alpha(fixed, base_alphas), inputs,
                              outputs, fgrads)
    if hp.loss_floor > 0.0 and hard_nearest <= hp.loss_floor:
        logger.info("recon %s: nearest-rounding loss %.6f already below "
                    "floor %g — skipping optimization", unit.name,
                    hard_nearest, hp.loss_floor)
        if stats is not None:
            stats[unit.name] = {"hard_nearest": hard_nearest,
                                "kept": "nearest", "skipped": True}
        return wstate, None

    it0 = 0
    opt_state = None
    if partial_path is not None and os.path.exists(partial_path):
        tmpl = optax.adam(hp.lr_alpha).init(alphas)
        alphas, opt_state, it0, key = _load_partial(partial_path, alphas,
                                                    tmpl)
        logger.info("recon %s: resuming mid-unit at iter %d/%d",
                    unit.name, it0, hp.iters)

    def _segments(c_end, run):
        """Advance it0 to ``c_end`` in ≤RESUME_SEG_ITERS programs, saving
        the partial state after each (``run`` executes one segment)."""
        nonlocal alphas, opt_state, it0, key
        parts = []
        while it0 < c_end:
            seg = min(RESUME_SEG_ITERS, c_end - it0) \
                if partial_path is not None else c_end - it0
            key, k = jax.random.split(key)
            alphas, opt_state, ls = run(k, it0, seg)
            it0 += seg
            parts.append(ls)
            if partial_path is not None and jax.process_index() == 0:
                _save_partial(partial_path, alphas, opt_state, it0, key)
        return parts

    loss_parts = []
    if on_host:
        # host-offloaded cache: stream sample chunks to the device and
        # run the iteration schedule as segments over each chunk (the
        # reference's keep_gpu=False path moves every minibatch
        # host->GPU per iter — per-iter transfers through a TPU host
        # round-trip would dominate, so we chunk instead)
        ndev = 1 if mesh is None else mesh.shape["dp"]
        n = jax.tree.leaves(inputs)[0].shape[0]
        chunk_n = max(hp.batch_size, ndev,
                      min(n, _HOST_CHUNK_BYTES // max(1, _bytes_per_row(
                          inputs, outputs))))
        chunk_n = max(ndev, (chunk_n // ndev) * ndev)
        chunk_n = min(chunk_n, max(ndev, (n // ndev) * ndev))
        n_chunks = -(-n // chunk_n)
        iters_per = [hp.iters // n_chunks] * n_chunks
        iters_per[-1] += hp.iters - sum(iters_per)
        perm = np.random.RandomState(0).permutation(n)
        cum = 0
        for c in range(n_chunks):
            c_end = cum + iters_per[c]
            cum = c_end
            if it0 >= c_end:
                continue  # chunk finished before the crash
            # equal-size chunks (one compiled segment program); the last
            # chunk wraps to the front rather than shrinking
            sel = perm[(c * chunk_n + np.arange(chunk_n)) % n]
            cin = jax.tree.map(lambda x: jnp.asarray(x[sel]), inputs)
            cout = jax.tree.map(lambda x: jnp.asarray(x[sel]), outputs)
            cg = None if fgrads is None else jnp.asarray(
                np.asarray(fgrads)[sel])
            if mesh is not None:
                cin, cout, cg = _shard_samples(mesh, cin, cout, cg)
            loss_parts += _segments(c_end, lambda k, i0, n_it: _recon_run(
                adapter.unit_fwd, unit.kind, role_cfgs, unit.extra, hp,
                uparams, fixed, alphas, cin, cout, k, cg,
                opt_state=opt_state, iter0=i0, n_iters=n_it, mesh=mesh))
    else:
        loss_parts += _segments(hp.iters, lambda k, i0, n_it: _recon_run(
            adapter.unit_fwd, unit.kind, role_cfgs, unit.extra, hp,
            uparams, fixed, alphas, inputs, outputs, k, fgrads,
            opt_state=opt_state, iter0=i0, n_iters=n_it, mesh=mesh))
    losses = jnp.concatenate(loss_parts) if loss_parts else None

    hard_trained = _hard_eval(adapter.unit_fwd, unit.kind, role_cfgs,
                              unit.extra, hp, uparams,
                              _merge_alpha(fixed, alphas), inputs,
                              outputs, fgrads)
    keep_trained = hard_trained < hard_nearest
    logger.info("recon %s guard: hard loss nearest %.6f vs trained "
                "%.6f -> keep %s", unit.name, hard_nearest, hard_trained,
                "trained" if keep_trained else "nearest")
    if stats is not None:
        stats[unit.name] = {"hard_nearest": hard_nearest,
                            "hard_trained": hard_trained,
                            "kept": "trained" if keep_trained
                            else "nearest"}
    if not keep_trained:
        # nearest rounding wins: keep the baseline alphas (init_alpha
        # hard-rounds to nearest), so inference, deployment, and later
        # units' asym prefixes all realize nearest — schema unchanged
        alphas = base_alphas
    new_wstate = dict(wstate)
    for role, full in unit.layers:
        if role in alphas:
            new_wstate[full] = dict(new_wstate[full])
            new_wstate[full]["alpha"] = alphas[role]
    return new_wstate, losses


# ---------------------------------------------------------------------------
# Act-phase reconstruction (reconstruction.py:43-48)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("unit_fwd", "kind", "role_cfgs", "extra", "hp",
                     "mesh"))
def _act_run(unit_fwd, kind: str, role_cfgs: tuple, extra: tuple,
             hp: ReconHP, uparams, wstate_roles, zps, deltas, inputs,
             outputs, key, fgrads=None, mesh=None):
    """Act-phase optimization for one unit: Adam on the activation
    quantizer deltas, lr ``hp.lr_delta`` with cosine annealing to 0 over
    ``hp.iters``, reconstruction loss only (round-loss NONE) — the
    reference's ``use_aq`` branch of layer/block/tib_reconstruction
    (reconstruction.py:43-48, CosineAnnealingLR T_max=iters eta_min=0).
    Weight quantizers run in hard-rounding inference mode (soft_tgt was
    reset after the weight phase)."""
    opt = optax.adam(optax.cosine_decay_schedule(hp.lr_delta, hp.iters))
    opt_state = opt.init(deltas)
    ndev = 1 if mesh is None else mesh.shape["dp"]

    def loss_fn(d, binp, bout, bg):
        ast = {r: {"delta": d[r], "zp": zps[r]} for r in d}
        pred = unit_fwd(kind, role_cfgs, extra, uparams, wstate_roles,
                        ast, binp, False, True)
        return _rec_loss(pred, bout, hp.p, hp.rloss, bg)

    def body(deltas, opt_state, inputs, outputs, fgrads, key):
        n = jax.tree.leaves(inputs)[0].shape[0]
        bs = max(1, min(hp.batch_size, n * ndev) // ndev)
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index("dp"))

        def step(carry, i):
            d, ost, k = carry
            k, k1 = jax.random.split(k)
            idx = jax.random.permutation(k1, n)[:bs]
            binp = _f32(jax.tree.map(lambda x: x[idx], inputs))
            bout = _f32(jax.tree.map(lambda x: x[idx], outputs))
            bg = None if fgrads is None else fgrads[idx]
            rec, grads = jax.value_and_grad(loss_fn)(d, binp, bout, bg)
            if mesh is not None:
                grads = jax.lax.pmean(grads, "dp")
                rec = jax.lax.pmean(rec, "dp")
            updates, ost = opt.update(grads, ost)
            d = optax.apply_updates(d, updates)
            return (d, ost, k), rec

        (deltas, _, _), losses = jax.lax.scan(
            step, (deltas, opt_state, key), jnp.arange(hp.iters))
        return deltas, losses

    if mesh is None:
        return body(deltas, opt_state, inputs, outputs, fgrads, key)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    data = P("dp")
    run = shard_map(
        lambda d, o, i, u, f, k: body(d, o, i, u, f, k), mesh=mesh,
        in_specs=(P(), P(), data, data,
                  P() if fgrads is None else data, P()),
        out_specs=(P(), P()),
        # vma checking ON — same argument as the weight phase above
        check_vma=True)
    return run(deltas, opt_state, inputs, outputs, fgrads, key)


def reconstruct_unit_act(adapter: ModelAdapter, unit: UnitSpec, params,
                         wstate, astate, inputs, outputs, hp: ReconHP,
                         key, fgrads=None, mesh=None):
    """Act-phase reconstruction for one unit: returns astate with the
    unit's activation deltas re-optimized against the cached FP outputs
    (inputs must have been captured with ``use_aq=True``)."""
    role_cfgs = adapter.role_cfgs(unit, frozenset())
    uparams = adapter.extract_uparams(params, unit)
    wstate_roles = {role: wstate[full] for role, full in unit.layers
                    if full in wstate}
    deltas, zps, full_of = {}, {}, {}
    for role, full in tuple(unit.layers) + tuple(unit.act_sites):
        pol = adapter.policy.get(full)
        st = astate.get(full)
        if pol is None or not pol.aq or st is None:
            continue
        deltas[role] = st["delta"]
        zps[role] = st["zp"]
        full_of[role] = full
    if not deltas:
        return astate, None
    if mesh is not None:
        inputs, outputs, fgrads = _shard_samples(mesh, inputs, outputs,
                                                 fgrads)

    def _ast(d):
        return {r: {"delta": d[r], "zp": zps[r]} for r in d}

    loss_before = _hard_eval(adapter.unit_fwd, unit.kind, role_cfgs,
                             unit.extra, hp, uparams, wstate_roles,
                             inputs, outputs, fgrads, ast=_ast(deltas),
                             use_aq=True)
    deltas0 = deltas
    deltas, losses = _act_run(
        adapter.unit_fwd, unit.kind, role_cfgs, unit.extra, hp, uparams,
        wstate_roles, zps, deltas, inputs, outputs, key, fgrads,
        mesh=mesh)
    # do-no-harm: keep the calibrated deltas if optimization regressed
    # them (same guard as the weight phase; the reference keeps the
    # optimized values unconditionally, reconstruction.py:43-48)
    loss_after = _hard_eval(adapter.unit_fwd, unit.kind, role_cfgs,
                            unit.extra, hp, uparams, wstate_roles,
                            inputs, outputs, fgrads, ast=_ast(deltas),
                            use_aq=True)
    if loss_after >= loss_before:
        logger.info("act recon %s guard: %.6f -> %.6f, keeping original "
                    "deltas", unit.name, loss_before, loss_after)
        deltas = deltas0
    new_astate = dict(astate)
    for role, d in deltas.items():
        full = full_of[role]
        new_astate[full] = dict(new_astate[full])
        new_astate[full]["delta"] = d
    return new_astate, losses


def reconstruct_act(adapter: ModelAdapter, params, cali_data, wstate,
                    astate, hp: ReconHP, key, *,
                    capture_batch_size: int = 128, log=None, mesh=None):
    """Sequential act-phase reconstruction over all units (the reference
    runs this as the ``use_aq=True`` second pass of recon_model).
    ``astate`` is a flat ``{site: {delta, zp}}`` dict — e.g. one FSC
    group's slice — whose deltas get re-optimized in place."""
    def _has_act(unit):
        return any(
            (pol := adapter.policy.get(full)) is not None and pol.aq
            and full in astate
            for _, full in tuple(unit.layers) + tuple(unit.act_sites))

    # shared FP-output cache, as in the weight phase (act-phase targets
    # are the same prefix-independent FP outputs)
    act_units = [u for u in adapter.units
                 if u.recon and adapter.default_train_roles(u)
                 and not u.kind.startswith("tib") and _has_act(u)]
    fp_outs = {}
    if hp.asym and act_units:
        ptape = jax.tree.map(np.asarray, _capture_many_batch(
            adapter, frozenset(u.name for u in act_units),
            frozenset({"out"}), params,
            tuple(x[:1] for x in cali_data)))
        total = sum(_bytes_per_row((), v) for v in ptape.values()) \
            * cali_data[0].shape[0] // 2  # f16 host cache
        if total <= FP_OUT_HOST_BUDGET:
            fp_outs = precapture_fp_outs(
                adapter, [u.name for u in act_units], params, cali_data,
                batch_size=capture_batch_size)

    for unit in adapter.units:
        if not unit.recon or not adapter.default_train_roles(unit):
            continue
        if not _has_act(unit):
            continue
        inputs, outputs = capture_unit_io(
            adapter, unit, params, cali_data, wstate, astate,
            asym=hp.asym, use_aq=True, batch_size=capture_batch_size,
            fp_out=fp_outs.get(unit.name))
        key, k = jax.random.split(key)
        astate, losses = reconstruct_unit_act(
            adapter, unit, params, wstate, astate, inputs, outputs,
            hp, k, mesh=mesh)
        if log is not None and losses is not None:
            log(unit.name, losses)
    return astate


def reconstruct(adapter: ModelAdapter, params, cali_data, wstate,
                hp: ReconHP, key, *, capture_batch_size: int = 128,
                log=None, mesh=None, resume_dir: Optional[str] = None,
                stats: Optional[dict] = None):
    """Sequential unit-by-unit reconstruction in module order
    (recon_model DFS, calibration.py:56-84). Each unit's asym inputs are
    captured under the current (partially reconstructed, hard-rounded)
    prefix — order matters, exactly as in the reference.

    ``mesh``: run each unit's Adam loop data-parallel over the mesh
    (``mesh=`` argument). ``resume_dir``: per-unit checkpointing — unit
    results are persisted as they finish and completed units are skipped
    on restart (the reference only writes the artifact after ALL units,
    calibration.py:153-154, so a crash loses everything)."""
    import os

    import numpy as np

    if resume_dir:
        os.makedirs(resume_dir, exist_ok=True)

    def _unit_path(name):
        return os.path.join(resume_dir, name.replace("/", "_") + ".npz")

    def _resumable(unit):
        return resume_dir and os.path.exists(_unit_path(unit.name))

    # ONE 1-sample FP probe returns every pending unit's I/O shapes (for
    # the host-offload decision) — the previous per-unit probe compiled a
    # separate 1-sample capture program per unit
    pending = [u for u in adapter.units
               if u.recon and adapter.default_train_roles(u)
               and not u.kind.startswith("tib") and not _resumable(u)]
    n_samples = cali_data[0].shape[0]
    row_bytes, out_bytes = {}, {}
    if pending:
        ptape = jax.tree.map(np.asarray, _capture_many_batch(
            adapter, frozenset(u.name for u in pending),
            frozenset({"in", "out"}), params,
            tuple(x[:1] for x in cali_data)))
        for u in pending:
            p_in, p_out = ptape[f"{u.name}::in"], ptape[f"{u.name}::out"]
            row_bytes[u.name] = _bytes_per_row(p_in, p_out)
            out_bytes[u.name] = _bytes_per_row((), p_out)

    # shared FP-output cache: one pass over the cali set serves every
    # unit's recon targets (FP outputs are prefix-independent; only the
    # asym INPUT captures depend on the partially reconstructed prefix)
    fp_outs = {}
    if hp.asym and pending:
        # the host cache is f16 — half the probe's f32 accounting
        total = sum(out_bytes.values()) * n_samples // 2
        if total <= FP_OUT_HOST_BUDGET:
            logger.info("recon: precapturing FP outputs of %d units in "
                        "one pass (~%.1f GiB host, f16)", len(pending),
                        total / (1 << 30))
            fp_outs = precapture_fp_outs(
                adapter, [u.name for u in pending], params, cali_data,
                batch_size=capture_batch_size)
        else:
            logger.info("recon: FP-output cache ~%.1f GiB exceeds budget"
                        " — per-unit fused capture", total / (1 << 30))

    for unit in adapter.units:
        train = adapter.default_train_roles(unit)
        if not unit.recon or not train:
            continue
        if _resumable(unit):
            data = np.load(_unit_path(unit.name))
            for role, full in unit.layers:
                akey = f"{full}::alpha"
                if akey in data.files:
                    wstate[full] = dict(wstate[full])
                    wstate[full]["alpha"] = jnp.asarray(data[akey])
            key, _ = jax.random.split(key)  # keep the RNG stream aligned
            if log is not None:
                log(unit.name, None)
            continue
        to_host = False
        if not unit.kind.startswith("tib"):
            est = row_bytes[unit.name] * n_samples
            to_host = est > HOST_OFFLOAD_BYTES
            if to_host:
                logger.info("recon %s: cached I/O ~%.1f GiB -> host "
                            "offload, chunked schedule", unit.name,
                            est / (1 << 30))
        inputs, outputs = capture_unit_io(
            adapter, unit, params, cali_data, wstate,
            asym=hp.asym, use_aq=hp.use_aq,
            batch_size=capture_batch_size, to_host=to_host,
            fp_out=fp_outs.get(unit.name))
        fgrads = None
        if hp.rloss != "mse" and not unit.kind.startswith("tib"):
            fgrads = capture_unit_grads(adapter, unit, params, cali_data,
                                        wstate, use_aq=hp.use_aq,
                                        batch_size=capture_batch_size)
        key, k = jax.random.split(key)
        partial = _unit_path(unit.name) + ".partial" if resume_dir \
            else None
        wstate, losses = reconstruct_unit(adapter, unit, params,
                                          wstate, inputs, outputs,
                                          hp, k, fgrads, mesh=mesh,
                                          partial_path=partial,
                                          stats=stats)
        if resume_dir and jax.process_index() == 0:
            np.savez(_unit_path(unit.name),
                     **{f"{full}::alpha": np.asarray(
                         wstate[full]["alpha"])
                        for _, full in unit.layers
                        if "alpha" in wstate.get(full, {})})
            if partial and os.path.exists(partial):
                os.remove(partial)
        if log is not None and losses is not None:
            log(unit.name, losses)
    return wstate
