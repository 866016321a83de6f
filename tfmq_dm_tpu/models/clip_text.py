"""CLIP text encoder (ViT-L/14 text tower) — functional JAX.

TPU-native replacement for the reference's FrozenCLIPEmbedder
(/root/reference/stable-diffusion/ldm/modules/encoders/modules.py:137-162),
which wraps HuggingFace ``CLIPTextModel``. Here the text transformer is a
pure function over a flat param dict keyed by the HF ``state_dict`` names
(conversion = relabel + transpose), returning ``last_hidden_state`` —
exactly what ``get_learned_conditioning`` feeds into cross-attention.

Tokenization uses HF ``CLIPTokenizer`` when its vocab is available
locally (zero-egress environments must supply the files); tests validate
the transformer against a randomly initialized ``CLIPTextModel``.

Also provides :func:`class_embed` (ClassEmbedder, modules.py:21-33) for
class-conditional LDM (cin256-v2).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    eps: float = 1e-5


def vit_l_14_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def tiny_clip_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=4,
                          max_len=16)


def iter_layers(cfg: CLIPTextConfig):
    w = cfg.width
    yield ("embed", "text_model.embeddings.token_embedding",
           (cfg.vocab_size, w))
    yield ("embed", "text_model.embeddings.position_embedding",
           (cfg.max_len, w))
    for i in range(cfg.layers):
        p = f"text_model.encoder.layers.{i}"
        yield ("lnorm", f"{p}.layer_norm1", w)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield ("linear", f"{p}.self_attn.{proj}", (w, w))
        yield ("lnorm", f"{p}.layer_norm2", w)
        yield ("linear", f"{p}.mlp.fc1", (w, 4 * w))
        yield ("linear", f"{p}.mlp.fc2", (4 * w, w))
    yield ("lnorm", "text_model.final_layer_norm", w)


def init_params(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Dict:
    params = {}
    for kind, name, shape in iter_layers(cfg):
        if kind == "lnorm":
            params[name] = {"scale": jnp.ones((shape,), dtype),
                            "bias": jnp.zeros((shape,), dtype)}
        elif kind == "embed":
            key, k = jax.random.split(key)
            params[name] = {"w": jax.random.normal(k, shape, dtype) * 0.02}
        else:
            key, k1, k2 = jax.random.split(key, 3)
            b = 1.0 / jnp.sqrt(shape[0])
            params[name] = {
                "w": jax.random.uniform(k1, shape, dtype, -b, b),
                "b": jnp.zeros((shape[-1],), dtype)}
    return params


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _lin(p, x):
    return x @ p["w"] + p["b"]


def quick_gelu(x):
    """HF CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def apply(params: Dict, cfg: CLIPTextConfig,
          input_ids: jax.Array) -> jax.Array:
    """-> last_hidden_state (B, T, width); causal self-attention."""
    b, t = input_ids.shape
    x = params["text_model.embeddings.token_embedding"]["w"][input_ids]
    x = x + params["text_model.embeddings.position_embedding"]["w"][:t]
    causal = jnp.tril(jnp.ones((t, t), bool))
    neg = jnp.finfo(x.dtype).min
    for i in range(cfg.layers):
        p = f"text_model.encoder.layers.{i}"
        h = _ln(params[f"{p}.layer_norm1"], x, cfg.eps)
        hd = cfg.width // cfg.heads
        scale = hd ** -0.5
        q = _lin(params[f"{p}.self_attn.q_proj"], h) * scale
        k = _lin(params[f"{p}.self_attn.k_proj"], h)
        v = _lin(params[f"{p}.self_attn.v_proj"], h)
        q = q.reshape(b, t, cfg.heads, hd)
        k = k.reshape(b, t, cfg.heads, hd)
        v = v.reshape(b, t, cfg.heads, hd)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        sim = jnp.where(causal[None, None], sim, neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = o.reshape(b, t, cfg.width)
        x = x + _lin(params[f"{p}.self_attn.out_proj"], o)
        h = _ln(params[f"{p}.layer_norm2"], x, cfg.eps)
        h = quick_gelu(_lin(params[f"{p}.mlp.fc1"], h))
        x = x + _lin(params[f"{p}.mlp.fc2"], h)
    return _ln(params["text_model.final_layer_norm"], x, cfg.eps)


def class_embed(emb_table: jax.Array, y: jax.Array) -> jax.Array:
    """ClassEmbedder for cross-attention conditioning (modules.py:28-33):
    returns (B, 1, embed_dim)."""
    return emb_table[y][:, None, :]


def stub_tokenize(texts, cfg: CLIPTextConfig):
    """Deterministic hash tokenizer for tiny/test text tasks (no HF
    vocab dependency): word -> md5 bucket in [3, vocab), BOS=1, EOS=2,
    PAD=0. NOT the CLIP BPE — real SD checkpoints must use
    :func:`tokenize`."""
    import hashlib
    out = np.zeros((len(texts), cfg.max_len), np.int32)
    for i, text in enumerate(texts):
        ids = [1]
        for wd in str(text).lower().split()[:cfg.max_len - 2]:
            h = int(hashlib.md5(wd.encode()).hexdigest(), 16)
            ids.append(3 + h % (cfg.vocab_size - 3))
        ids.append(2)
        out[i, :len(ids)] = ids
    return jnp.asarray(out)


def tokenize(texts, max_length: int = 77):
    """Tokenize with HF CLIPTokenizer (requires local vocab files —
    zero-egress deployments must pre-seed the HF cache). Returns an
    int32 array (B, max_length), padded like FrozenCLIPEmbedder."""
    from transformers import CLIPTokenizer
    tok = CLIPTokenizer.from_pretrained("openai/clip-vit-large-patch14")
    enc = tok(list(texts), truncation=True, max_length=max_length,
              padding="max_length", return_tensors="np")
    return jnp.asarray(enc["input_ids"].astype(np.int32))
