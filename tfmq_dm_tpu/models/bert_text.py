"""BERT-style text encoder for the text-conditional LDM family —
functional JAX.

TPU-native replacement for the reference's ``BERTEmbedder``
(/root/reference/stable-diffusion/ldm/modules/encoders/modules.py:80-103),
which wraps the vendored x-transformers subset: ``TransformerWrapper``
with an ``Encoder(dim, depth)`` attention stack
(ldm/modules/x_transformer.py:548-638, 370-538). With the defaults the
reference instantiates, the active architecture is exactly a pre-LN
transformer encoder:

- learned token + absolute positional embeddings
  (x_transformer.py:25-36, 572-574, 609-610);
- per depth: [LayerNorm -> Attention -> residual,
  LayerNorm -> FeedForward -> residual] (layers list built at
  x_transformer.py:424-479, forward at 497-528; pre_norm=True default);
- Attention with heads=8 and FIXED dim_head=64 regardless of model dim
  (DEFAULT_DIM_HEAD, x_transformer.py:12,219-242): inner_dim = 512,
  bias-free q/k/v projections, biased output projection, non-causal,
  no mask in the BERTEmbedder path;
- FeedForward = Linear(dim, 4*dim) -> exact GELU -> Linear(4*dim, dim)
  (x_transformer.py:194-211, glu=False default);
- final LayerNorm; ``return_embeddings=True`` skips ``to_logits``
  (x_transformer.py:624-628), so the (dim, num_tokens) logit head is
  never used for conditioning and is not modeled here.

Used by the LDM text2img checkpoints (txt2img-1p4B-eval.yaml:68-71
n_embed=1280/n_layer=32; models/ldm/text2img256/config.yaml:59-62
n_embed=640/n_layer=32). Param names equal the torch ``state_dict``
paths under ``cond_stage_model.transformer.`` so checkpoint conversion
is the standard relabel+transpose (`utils.torch_convert`).

Tokenization (BERTTokenizer, modules.py:53-67: HF bert-base-uncased,
pad-to-max_length) needs the HF vocab locally; zero-egress environments
use :func:`clip_text.stub_tokenize`-style hashing via
:func:`stub_tokenize`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BERTTextConfig:
    vocab_size: int = 30522        # bert-base-uncased (modules.py:54)
    dim: int = 1280                # n_embed
    depth: int = 32                # n_layer
    heads: int = 8                 # Attention default (x_transformer.py:220)
    dim_head: int = 64             # DEFAULT_DIM_HEAD — NOT dim//heads
    max_len: int = 77              # max_seq_len (modules.py:82)
    eps: float = 1e-5              # torch LayerNorm default


def txt2img_1p4b_config() -> BERTTextConfig:
    """configs/latent-diffusion/txt2img-1p4B-eval.yaml:68-71."""
    return BERTTextConfig(dim=1280, depth=32)


def text2img_256_config() -> BERTTextConfig:
    """models/ldm/text2img256/config.yaml:59-62."""
    return BERTTextConfig(dim=640, depth=32)


def tiny_bert_config() -> BERTTextConfig:
    return BERTTextConfig(vocab_size=100, dim=32, depth=2, heads=2,
                          dim_head=8, max_len=16)


def iter_layers(cfg: BERTTextConfig):
    """(kind, checkpoint-path, shape) for every learned tensor, in the
    torch ``TransformerWrapper.state_dict()`` naming (layers list index
    2i = attention sublayer, 2i+1 = feedforward; .0 = the pre-norm,
    .1 = the block — x_transformer.py:475-479)."""
    d, inner = cfg.dim, cfg.heads * cfg.dim_head
    yield ("embed", "token_emb", (cfg.vocab_size, d))
    yield ("embed", "pos_emb.emb", (cfg.max_len, d))
    for i in range(cfg.depth):
        a = f"attn_layers.layers.{2 * i}"
        yield ("lnorm", f"{a}.0", d)
        yield ("linear_nb", f"{a}.1.to_q", (d, inner))
        yield ("linear_nb", f"{a}.1.to_k", (d, inner))
        yield ("linear_nb", f"{a}.1.to_v", (d, inner))
        yield ("linear", f"{a}.1.to_out", (inner, d))
        f = f"attn_layers.layers.{2 * i + 1}"
        yield ("lnorm", f"{f}.0", d)
        yield ("linear", f"{f}.1.net.0.0", (d, 4 * d))
        yield ("linear", f"{f}.1.net.2", (4 * d, d))
    yield ("lnorm", "norm", d)


def init_params(key, cfg: BERTTextConfig, dtype=jnp.float32) -> Dict:
    params = {}
    for kind, name, shape in iter_layers(cfg):
        if kind == "lnorm":
            params[name] = {"scale": jnp.ones((shape,), dtype),
                            "bias": jnp.zeros((shape,), dtype)}
        elif kind == "embed":
            key, k = jax.random.split(key)
            params[name] = {"w": jax.random.normal(k, shape, dtype) * 0.02}
        else:
            key, k = jax.random.split(key)
            b = 1.0 / jnp.sqrt(shape[0])
            params[name] = {"w": jax.random.uniform(k, shape, dtype, -b, b)}
            if kind == "linear":
                params[name]["b"] = jnp.zeros((shape[-1],), dtype)
    return params


def _ln(p, x, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _lin(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def apply(params: Dict, cfg: BERTTextConfig,
          input_ids: jax.Array) -> jax.Array:
    """-> embeddings (B, T, dim): TransformerWrapper.forward with
    return_embeddings=True (x_transformer.py:598-628), non-causal,
    unmasked — the BERTEmbedder conditioning path (modules.py:93-99)."""
    b, t = input_ids.shape
    x = params["token_emb"]["w"][input_ids]
    x = x + params["pos_emb.emb"]["w"][:t]
    scale = cfg.dim_head ** -0.5
    for i in range(cfg.depth):
        a = f"attn_layers.layers.{2 * i}"
        h = _ln(params[f"{a}.0"], x, cfg.eps)
        q = _lin(params[f"{a}.1.to_q"], h) * scale
        k = _lin(params[f"{a}.1.to_k"], h)
        v = _lin(params[f"{a}.1.to_v"], h)
        q = q.reshape(b, t, cfg.heads, cfg.dim_head)
        k = k.reshape(b, t, cfg.heads, cfg.dim_head)
        v = v.reshape(b, t, cfg.heads, cfg.dim_head)
        sim = jnp.einsum("bihd,bjhd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhij,bjhd->bihd", attn, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + _lin(params[f"{a}.1.to_out"],
                     o.reshape(b, t, cfg.heads * cfg.dim_head))
        f = f"attn_layers.layers.{2 * i + 1}"
        h = _ln(params[f"{f}.0"], x, cfg.eps)
        # exact (erf) GELU: torch nn.GELU() default (x_transformer.py:201)
        h = jax.nn.gelu(_lin(params[f"{f}.1.net.0.0"], h),
                        approximate=False)
        x = x + _lin(params[f"{f}.1.net.2"], h)
    return _ln(params["norm"], x, cfg.eps)


def stub_tokenize(texts, cfg: BERTTextConfig):
    """Deterministic hash tokenizer for tiny/test tasks (same scheme as
    clip_text.stub_tokenize; BERT's [CLS]/[SEP]/[PAD]=101/102/0 are
    irrelevant to the hash scheme, which only needs determinism)."""
    from . import clip_text
    return clip_text.stub_tokenize(texts, cfg)


def tokenize(texts, max_length: int = 77):
    """Tokenize with HF BertTokenizerFast (modules.py:57-66: truncate +
    pad to max_length). Requires local vocab files — zero-egress
    deployments must pre-seed the HF cache."""
    from transformers import BertTokenizerFast
    tok = BertTokenizerFast.from_pretrained("bert-base-uncased")
    enc = tok(list(texts), truncation=True, max_length=max_length,
              padding="max_length", return_tensors="np")
    return jnp.asarray(enc["input_ids"].astype(np.int32))
