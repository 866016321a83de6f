"""DDPM training — TPU-native rebuild of the reference's DDIM trainer.

Reference behavior (ddim/runners/diffusion.py:109-201 +
ddim/functions/losses.py + ddim/configs/cifar10.yml training/optim
sections): epsilon-prediction training with antithetic uniform timestep
sampling (`t` and `T-1-t` paired across the batch), "simple" loss
`mean_b sum_pix (eps - model(x_t, t))^2`, Adam(lr=2e-4), global grad
clip 1.0, and an EMA shadow of the parameters (rate 0.9999) that is
what actually gets sampled/quantized (EMAHelper, ddim/models/ema.py).

TPU-first differences from the reference's eager loop:

- the whole inner loop is ONE jitted ``lax.scan`` over steps — data
  generation (a pure jittable ``batch_fn(key)``), forward, backward,
  optax update, and the EMA blend all live inside the compiled program;
  the host only sees a loss trace every ``chunk`` steps;
- data parallelism is sharding, not a DDP wrapper: the caller places the
  params replicated and lets the batch split over the mesh's ``dp`` axis
  (``in_shardings``) — XLA inserts the gradient reduce-scatter/all-reduce
  itself, replacing the reference's per-param NCCL hooks
  (linklink/dist_helper.py:90-129);
- checkpointing is an explicit flat npz of the params pytree
  (:func:`save_params`/:func:`load_params`), not a pickled nn.Module
  state dict.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class TrainHP:
    """cifar10.yml training/optim defaults."""

    lr: float = 2e-4
    grad_clip: float = 1.0
    ema_rate: float = 0.9999
    batch_size: int = 128
    steps: int = 1000
    chunk: int = 50          # scan length per host round-trip / loss log
    weight_decay: float = 0.0


def make_optimizer(hp: TrainHP) -> optax.GradientTransformation:
    tx = [optax.clip_by_global_norm(hp.grad_clip)]
    if hp.weight_decay:
        tx.append(optax.adamw(hp.lr, weight_decay=hp.weight_decay))
    else:
        tx.append(optax.adam(hp.lr))
    return optax.chain(*tx)


def antithetic_t(key: jax.Array, n: int, num_timesteps: int) -> jax.Array:
    """Antithetic timestep draw: the second half of the batch mirrors the
    first (t, T-1-t) — variance reduction from the reference trainer
    (ddim/runners/diffusion.py:152-158)."""
    half = (n + 1) // 2
    t = jax.random.randint(key, (half,), 0, num_timesteps)
    return jnp.concatenate([t, num_timesteps - t - 1])[:n]


def noise_estimation_loss(apply_fn, params, x0: jax.Array, t: jax.Array,
                          noise: jax.Array,
                          alpha_bar: jax.Array) -> jax.Array:
    """'simple' loss (ddim/functions/losses.py:4-15): per-sample summed
    squared error of the eps prediction, averaged over the batch."""
    a = alpha_bar[t][:, None, None, None]
    x_t = jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise
    e = apply_fn(params, x_t, t)
    per = jnp.sum((noise - e) ** 2, axis=(1, 2, 3))
    return jnp.mean(per)


TrainState = Tuple[Dict, Dict, optax.OptState]  # (params, ema, opt)


def init_state(params: Dict, hp: TrainHP) -> TrainState:
    opt_state = make_optimizer(hp).init(params)
    return (params, jax.tree.map(jnp.copy, params), opt_state)


def make_train_chunk(apply_fn: Callable, betas: np.ndarray, hp: TrainHP,
                     batch_fn: Optional[Callable] = None):
    """Build ``chunk(state, key[, x0s]) -> (state, losses)`` running
    ``hp.chunk`` full train steps as one ``lax.scan``.

    ``apply_fn(params, x_t, t) -> eps``. With ``batch_fn(key) ->
    (batch, H, W, C)`` the data is generated inside the scan (on-device
    synthetic pipeline); without it, pass ``x0s`` of shape
    ``(chunk, batch, H, W, C)`` (host-fed real data)."""
    alpha_bar = jnp.asarray(np.cumprod(1.0 - np.asarray(betas)),
                            jnp.float32)
    num_t = int(np.asarray(betas).shape[0])
    opt = make_optimizer(hp)

    def one_step(state: TrainState, key: jax.Array, x0: jax.Array):
        params, ema, opt_state = state
        k_t, k_e = jax.random.split(key)
        t = antithetic_t(k_t, x0.shape[0], num_t)
        noise = jax.random.normal(k_e, x0.shape, x0.dtype)
        loss, grads = jax.value_and_grad(
            lambda p: noise_estimation_loss(apply_fn, p, x0, t, noise,
                                            alpha_bar))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(
            lambda e, p: hp.ema_rate * e + (1.0 - hp.ema_rate) * p,
            ema, params)
        return (params, ema, opt_state), loss

    if batch_fn is not None:
        def chunk(state: TrainState, key: jax.Array):
            def body(st, k):
                k_d, k_s = jax.random.split(k)
                return one_step(st, k_s, batch_fn(k_d))
            return lax.scan(body, state, jax.random.split(key, hp.chunk))
    else:
        def chunk(state: TrainState, key: jax.Array, x0s: jax.Array):
            def body(st, inp):
                k, x0 = inp
                return one_step(st, k, x0)
            return lax.scan(body, state,
                            (jax.random.split(key, hp.chunk), x0s))
    return chunk


def train(apply_fn: Callable, params: Dict, betas: np.ndarray,
          hp: TrainHP, key: jax.Array,
          batch_fn: Callable, mesh: Optional[Mesh] = None,
          log_fn: Optional[Callable[[int, float], None]] = None
          ) -> Tuple[Dict, Dict, np.ndarray]:
    """Run ``hp.steps`` training steps; returns (params, ema_params,
    loss_trace). With ``mesh``, params/opt replicate and ``batch_fn``'s
    output shards over ``dp`` via GSPMD (batch stays global-sized)."""
    state = init_state(params, hp)
    if mesh is not None:
        # seed GSPMD: params replicated, each synthetic batch constrained
        # to shard over dp where it is generated — XLA then all-reduces
        # the grads itself (the reference's per-param NCCL hooks,
        # linklink/dist_helper.py:90-129, have no equivalent to write).
        repl = NamedSharding(mesh, P())
        dp = NamedSharding(mesh, P("dp"))
        state = jax.tree.map(lambda a: jax.device_put(a, repl), state)
        inner_batch = batch_fn

        def batch_fn(k):  # noqa: F811 — sharded wrapper
            return lax.with_sharding_constraint(inner_batch(k), dp)
        chunk = jax.jit(make_train_chunk(apply_fn, betas, hp,
                                         batch_fn=batch_fn),
                        out_shardings=(repl, repl))
    else:
        chunk = jax.jit(make_train_chunk(apply_fn, betas, hp,
                                         batch_fn=batch_fn))

    # A trailing partial chunk runs as its own (shorter) compiled scan so
    # exactly hp.steps optimizer steps execute — never rounded up.
    rem = hp.steps % hp.chunk
    tail_chunk = None
    if rem:
        hp_tail = dataclasses.replace(hp, chunk=rem)
        tail_fn = make_train_chunk(apply_fn, betas, hp_tail,
                                   batch_fn=batch_fn)
        tail_chunk = (jax.jit(tail_fn, out_shardings=(repl, repl))
                      if mesh is not None else jax.jit(tail_fn))

    traces = []
    done = 0
    while done < hp.steps:
        key, k = jax.random.split(key)
        fn = tail_chunk if (rem and hp.steps - done == rem) else chunk
        state, losses = fn(state, k)
        losses = np.asarray(losses)
        done += losses.shape[0]
        traces.append(losses)
        if log_fn is not None:
            log_fn(done, float(losses.mean()))
    params, ema, _ = state
    return params, ema, np.concatenate(traces)


# ---------------------------------------------------------------------------
# Params checkpoint: flat npz of the pytree (versioned, like
# quant/artifact.py). Replaces torch.save(state_dict) +
# EMAHelper.state_dict (ddim/runners/diffusion.py:176-186).
# ---------------------------------------------------------------------------

def save_params(path: str, params: Dict, meta: Optional[dict] = None
                ) -> None:
    import json
    flat = {}
    for layer, st in params.items():
        if "::" in layer:
            raise ValueError(f"layer name {layer!r} contains the '::' "
                             "separator; rename it before saving")
        if isinstance(st, dict):
            for k, v in st.items():
                if "::" in k or isinstance(v, dict):
                    raise ValueError(
                        f"save_params expects a <=2-level pytree of "
                        f"arrays; {layer}.{k} is {type(v).__name__}")
                flat[f"p::{layer}::{k}"] = np.asarray(v)
        else:
            flat[f"p::{layer}::"] = np.asarray(st)
    m = dict(meta or {})
    m["format_version"] = 1
    flat["__meta__"] = np.frombuffer(json.dumps(m).encode("utf-8"),
                                     dtype=np.uint8)
    np.savez(path, **flat)


def load_params(path: str) -> Tuple[Dict, dict]:
    import json
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    params: Dict = {}
    for key in data.files:
        if key == "__meta__":
            continue
        _, layer, field = key.split("::")
        if field:
            params.setdefault(layer, {})[field] = jnp.asarray(data[key])
        else:
            params[layer] = jnp.asarray(data[key])
    return params, meta
