"""LDM / Stable-Diffusion UNet (OpenAI ``UNetModel``) — functional JAX,
NHWC / sequence-(B,T,C) layouts.

Re-implements the architecture of
/root/reference/stable-diffusion/ldm/modules/diffusionmodules/openaimodel.py:446-780
(ResBlock :163-277, AttentionBlock :280-326, QKVAttentionLegacy :372-405
with the TFMQ-factored QKMatMul/SMVMatMul quant points :349-369) and
ldm/modules/attention.py:152-260 (SpatialTransformer / BasicTransformer
Block / CrossAttention / GEGLU) TPU-first:

- parameters are a flat dict keyed by the torch ``state_dict`` module
  paths (conversion = relabel + transpose, utils/torch_convert.py);
- an explicit :func:`build_structure` descriptor list mirrors the
  reference's construction loop; init/forward/layer-inventory/unit-specs
  all walk it — no module tree, no monkey-patching (the reference patches
  CrossAttention.forward at wrap time, quant_block.py:279-280);
- every quantizable call site goes through quant/qfunc with its dotted
  name; attention act-quant sites follow QuantBasicTransformerBlock /
  QuantQKMatMul / QuantSMVMatMul placement;
- 1x1 Conv1d/Conv2d projections execute as (B,T,C) matmuls on the MXU.

Supported model family: LDM-{4,8} unconditional (CelebA/FFHQ/LSUN),
cin256-v2 class-conditional, SD v1.4 text-conditional.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops import nn as fnn
from ..quant import qfunc
from ..quant.context import QuantCtx
from ..quant.policy import LayerInfo


@dataclasses.dataclass(frozen=True)
class LDMUNetConfig:
    image_size: int = 64           # latent resolution
    in_channels: int = 3
    model_channels: int = 224
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 4, 2)   # ds factors
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = -1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4


def celeba_config() -> LDMUNetConfig:
    """LDM-4 CelebA-HQ/FFHQ (models/ldm/celeba256/config.yaml)."""
    return LDMUNetConfig(image_size=64, in_channels=3, model_channels=224,
                         out_channels=3, attention_resolutions=(8, 4, 2),
                         channel_mult=(1, 2, 3, 4), num_head_channels=32)


def lsun_beds_config() -> LDMUNetConfig:
    return LDMUNetConfig(image_size=64, in_channels=3, model_channels=224,
                         out_channels=3, attention_resolutions=(8, 4, 2),
                         channel_mult=(1, 2, 3, 4), num_head_channels=32)


def lsun_churches_config() -> LDMUNetConfig:
    """LDM-8 LSUN-Churches (models/ldm/lsun_churches256/config.yaml):
    KL-f8, scale-shift norm, resblock up/down."""
    return LDMUNetConfig(image_size=32, in_channels=4, model_channels=192,
                         out_channels=4,
                         attention_resolutions=(1, 2, 4, 8),
                         channel_mult=(1, 2, 2, 4, 4), num_heads=8,
                         use_scale_shift_norm=True, resblock_updown=True)


def cin256_config() -> LDMUNetConfig:
    """class-conditional ImageNet (configs/latent-diffusion/cin256-v2.yaml):
    conditioning enters as cross-attention context from a ClassEmbedder
    (n_classes=1001, embed_dim=512), NOT via label_emb."""
    return LDMUNetConfig(image_size=64, in_channels=3, model_channels=192,
                         out_channels=3, attention_resolutions=(8, 4, 2),
                         channel_mult=(1, 2, 3, 5), num_heads=1,
                         use_spatial_transformer=True, transformer_depth=1,
                         context_dim=512)


def sd_v1_config() -> LDMUNetConfig:
    """Stable Diffusion v1.x (configs/stable-diffusion/v1-inference.yaml)."""
    return LDMUNetConfig(image_size=32, in_channels=4, model_channels=320,
                         out_channels=4, attention_resolutions=(4, 2, 1),
                         channel_mult=(1, 2, 4, 4), num_heads=8,
                         use_spatial_transformer=True, transformer_depth=1,
                         context_dim=768, legacy=False)


def tiny_ldm_config(**kw) -> LDMUNetConfig:
    """CPU-testable miniature of the LDM topology."""
    d = dict(image_size=8, in_channels=3, model_channels=32,
             out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
             channel_mult=(1, 2), num_head_channels=16)
    d.update(kw)
    return LDMUNetConfig(**d)


def tiny_sd_config(**kw) -> LDMUNetConfig:
    d = dict(image_size=8, in_channels=3, model_channels=32,
             out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
             channel_mult=(1, 2), num_heads=2,
             use_spatial_transformer=True, transformer_depth=1,
             context_dim=24, legacy=False)
    d.update(kw)
    return LDMUNetConfig(**d)


# ---------------------------------------------------------------------------
# Structure
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Sub:
    """One sub-module inside a TimestepEmbedSequential."""

    kind: str       # "conv"|"res"|"attn"|"strans"|"down"|"up"
    prefix: str
    c_in: int = 0
    c_out: int = 0
    heads: int = 1
    d_head: int = 0
    depth: int = 0
    updown: int = 0  # res blocks only: 0 none, 1 up, 2 down


def _attn_heads(cfg: LDMUNetConfig, ch: int) -> Tuple[int, int]:
    """(num_heads, dim_head) replication of the head-selection logic at
    openaimodel.py:575-583 / 625-632 / 665-680."""
    if cfg.num_head_channels == -1:
        num_heads = cfg.num_heads
        dim_head = ch // num_heads
    else:
        num_heads = ch // cfg.num_head_channels
        dim_head = cfg.num_head_channels
    if cfg.legacy:
        dim_head = ch // num_heads if cfg.use_spatial_transformer \
            else cfg.num_head_channels
    return num_heads, dim_head


def _make_attn(cfg, prefix, ch) -> Sub:
    heads, d_head = _attn_heads(cfg, ch)
    if cfg.use_spatial_transformer:
        return Sub("strans", prefix, c_in=ch, c_out=ch, heads=heads,
                   d_head=d_head, depth=cfg.transformer_depth)
    return Sub("attn", prefix, c_in=ch, c_out=ch, heads=heads,
               d_head=d_head)


def build_structure(cfg: LDMUNetConfig):
    """Lists of TimestepEmbedSequential groups mirroring the construction
    loop (openaimodel.py:550-720). Returns (input_groups, middle_group,
    output_groups); each group is a tuple of Sub."""
    mc = cfg.model_channels
    inputs: List[Tuple[Sub, ...]] = [
        (Sub("conv", "input_blocks.0.0", cfg.in_channels, mc),)]
    input_chans = [mc]
    ch = mc
    ds = 1
    n = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            subs = [Sub("res", f"input_blocks.{n}.0", ch, mult * mc)]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                subs.append(_make_attn(cfg, f"input_blocks.{n}.1", ch))
            inputs.append(tuple(subs))
            input_chans.append(ch)
            n += 1
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                inputs.append((Sub("res", f"input_blocks.{n}.0", ch, ch,
                                   updown=2),))
            else:
                inputs.append((Sub("down", f"input_blocks.{n}.0", ch,
                                   ch),))
            input_chans.append(ch)
            ds *= 2
            n += 1

    middle = (Sub("res", "middle_block.0", ch, ch),
              _make_attn(cfg, "middle_block.1", ch),
              Sub("res", "middle_block.2", ch, ch))

    outputs: List[Tuple[Sub, ...]] = []
    n = 0
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            subs = [Sub("res", f"output_blocks.{n}.0", ch + ich, mc * mult)]
            ch = mc * mult
            if ds in cfg.attention_resolutions:
                subs.append(_make_attn(cfg, f"output_blocks.{n}.1", ch))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    subs.append(Sub("res",
                                    f"output_blocks.{n}.{len(subs)}",
                                    ch, ch, updown=1))
                else:
                    subs.append(Sub("up",
                                    f"output_blocks.{n}.{len(subs)}",
                                    ch, ch))
                ds //= 2
            outputs.append(tuple(subs))
            n += 1
    return inputs, middle, tuple(outputs)


def iter_layers(cfg: LDMUNetConfig):
    """(kind, name, shape) for every parameterized tensor, in torch
    named_modules (definition) order. kinds: linear / conv / conv1d /
    norm / lnorm / embed / conv_fp (skip) / conv_ds (downsample op)."""
    mc, ted = cfg.model_channels, cfg.time_embed_dim
    yield ("linear", "time_embed.0", (mc, ted))
    yield ("linear", "time_embed.2", (ted, ted))
    if cfg.num_classes is not None:
        yield ("embed", "label_emb", (cfg.num_classes, ted))

    def emit_res(s: Sub):
        yield ("norm", f"{s.prefix}.in_layers.0", s.c_in)
        yield ("conv", f"{s.prefix}.in_layers.2", (3, 3, s.c_in, s.c_out))
        emb_out = 2 * s.c_out if cfg.use_scale_shift_norm else s.c_out
        yield ("linear", f"{s.prefix}.emb_layers.1", (ted, emb_out))
        yield ("norm", f"{s.prefix}.out_layers.0", s.c_out)
        yield ("conv", f"{s.prefix}.out_layers.3", (3, 3, s.c_out, s.c_out))
        if s.c_in != s.c_out:
            yield ("conv_fp", f"{s.prefix}.skip_connection",
                   (1, 1, s.c_in, s.c_out))

    def emit_attn(s: Sub):
        yield ("norm", f"{s.prefix}.norm", s.c_in)
        yield ("conv1d", f"{s.prefix}.qkv", (s.c_in, 3 * s.c_in))
        yield ("conv1d", f"{s.prefix}.proj_out", (s.c_in, s.c_in))

    def emit_strans(s: Sub):
        inner = s.heads * s.d_head
        yield ("norm", f"{s.prefix}.norm", s.c_in)
        yield ("conv", f"{s.prefix}.proj_in", (1, 1, s.c_in, inner))
        for d in range(s.depth):
            p = f"{s.prefix}.transformer_blocks.{d}"
            yield ("lnorm", f"{p}.norm1", inner)
            yield ("linear_nb", f"{p}.attn1.to_q", (inner, inner))
            yield ("linear_nb", f"{p}.attn1.to_k", (inner, inner))
            yield ("linear_nb", f"{p}.attn1.to_v", (inner, inner))
            yield ("linear", f"{p}.attn1.to_out.0", (inner, inner))
            yield ("lnorm", f"{p}.norm2", inner)
            cd = cfg.context_dim or inner
            yield ("linear_nb", f"{p}.attn2.to_q", (inner, inner))
            yield ("linear_nb", f"{p}.attn2.to_k", (cd, inner))
            yield ("linear_nb", f"{p}.attn2.to_v", (cd, inner))
            yield ("linear", f"{p}.attn2.to_out.0", (inner, inner))
            yield ("lnorm", f"{p}.norm3", inner)
            yield ("linear", f"{p}.ff.net.0.proj", (inner, inner * 8))
            yield ("linear", f"{p}.ff.net.2", (inner * 4, inner))
        yield ("conv", f"{s.prefix}.proj_out", (1, 1, inner, s.c_in))

    def emit_sub(s: Sub):
        if s.kind == "conv":
            yield ("conv", s.prefix, (3, 3, s.c_in, s.c_out))
        elif s.kind == "res":
            yield from emit_res(s)
        elif s.kind == "attn":
            yield from emit_attn(s)
        elif s.kind == "strans":
            yield from emit_strans(s)
        elif s.kind == "down":
            yield ("conv_ds", f"{s.prefix}.op", (3, 3, s.c_in, s.c_out))
        elif s.kind == "up":
            yield ("conv", f"{s.prefix}.conv", (3, 3, s.c_in, s.c_out))

    inputs, middle, outputs = build_structure(cfg)
    for group in inputs:
        for s in group:
            yield from emit_sub(s)
    for s in middle:
        yield from emit_sub(s)
    for group in outputs:
        for s in group:
            yield from emit_sub(s)
    yield ("norm", "out.0", mc)
    yield ("conv", "out.2", (3, 3, mc, cfg.out_channels))


def init_params(key: jax.Array, cfg: LDMUNetConfig,
                dtype=jnp.float32) -> Dict[str, dict]:
    params = {}
    for kind, name, shape in iter_layers(cfg):
        if kind in ("norm", "lnorm"):
            params[name] = {"scale": jnp.ones((shape,), dtype),
                            "bias": jnp.zeros((shape,), dtype)}
            continue
        if kind == "embed":
            key, k1 = jax.random.split(key)
            params[name] = {"w": jax.random.normal(k1, shape, dtype) * 0.02}
            continue
        key, k1, k2 = jax.random.split(key, 3)
        if kind in ("linear", "linear_nb", "conv1d"):
            fan_in = shape[0]
            wshape = shape
        else:
            fan_in = shape[0] * shape[1] * shape[2]
            wshape = shape
        bound = 1.0 / math.sqrt(fan_in)
        entry = {"w": jax.random.uniform(k1, wshape, dtype, -bound, bound)}
        if kind != "linear_nb":
            entry["b"] = jax.random.uniform(k2, (wshape[-1],), dtype,
                                            -bound, bound)
        params[name] = entry
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _norm(p, x):
    return fnn.group_norm(x, p["scale"], p["bias"], groups=32, eps=1e-5)


def _lnorm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _res_forward(params, cfg, s: Sub, x, emb_out, qctx):
    """ResBlock._forward (openaimodel.py:255-277) with the emb projection
    computed by the caller (TIB semantics share it)."""
    if qctx is not None:
        qctx.tap(s.prefix, "in", (x, emb_out))
    h = _norm(params[f"{s.prefix}.in_layers.0"], x)
    h = fnn.swish(h)
    if s.updown == 1:      # up: interpolate h and x (no conv),
        h = fnn.nearest_upsample_2x(h)       # openaimodel.py:255-261
        x = fnn.nearest_upsample_2x(x)
    elif s.updown == 2:    # down: 2x2 avg-pool h and x
        h = fnn.avg_pool_2x(h)
        x = fnn.avg_pool_2x(x)
    h = qfunc.qconv2d(qctx, f"{s.prefix}.in_layers.2", h,
                      params[f"{s.prefix}.in_layers.2"])
    if cfg.use_scale_shift_norm:
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = _norm(params[f"{s.prefix}.out_layers.0"], h) \
            * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
    else:
        h = h + emb_out[:, None, None, :]
        h = _norm(params[f"{s.prefix}.out_layers.0"], h)
    h = fnn.swish(h)
    h = qfunc.qconv2d(qctx, f"{s.prefix}.out_layers.3", h,
                      params[f"{s.prefix}.out_layers.3"])
    sc = params.get(f"{s.prefix}.skip_connection")
    if sc is not None:
        x = fnn.conv2d(x, sc["w"], sc.get("b"), padding="VALID")
    out = x + h
    if qctx is not None:
        out = qctx.tap(s.prefix, "out", out)
    return out


def res_emb_out(params, cfg, prefix: str, silu_emb, qctx):
    """emb_layers projection: Sequential(SiLU, Linear) — the quantized
    linear is `emb_layers.1` (quant_emb=True, trained in the TIB)."""
    return qfunc.qlinear(qctx, f"{prefix}.emb_layers.1", silu_emb,
                         params[f"{prefix}.emb_layers.1"])


def _attn_forward(params, s: Sub, x, qctx):
    """AttentionBlock + QKVAttentionLegacy with QKMatMul/SMVMatMul quant
    sites (openaimodel.py:280-326, 349-405). x: (B,H,W,C)."""
    if qctx is not None:
        qctx.tap(s.prefix, "in", (x,))
    b, hh, ww, c = x.shape
    t = hh * ww
    xs = x.reshape(b, t, c)
    h_ = _norm(params[f"{s.prefix}.norm"], xs)
    qkv = qfunc.qlinear(qctx, f"{s.prefix}.qkv", h_,
                        params[f"{s.prefix}.qkv"])  # (B,T,heads*3*ch)
    heads = s.heads
    ch = c // heads
    qkv = qkv.reshape(b, t, heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    a = attn_ops.qsm_attention(
        q * scale, k * scale, v, 1.0, qctx,
        {"q": f"{s.prefix}.attention.qkv_matmul.aqtizer_q",
         "k": f"{s.prefix}.attention.qkv_matmul.aqtizer_k",
         "v": f"{s.prefix}.attention.smv_matmul.aqtizer_v",
         "w": f"{s.prefix}.attention.smv_matmul.aqtizer_w"},
        out_dtype=x.dtype)
    a = a.reshape(b, t, c)
    h_ = qfunc.qlinear(qctx, f"{s.prefix}.proj_out", a,
                       params[f"{s.prefix}.proj_out"])
    out = (xs + h_).reshape(b, hh, ww, c)
    if qctx is not None:
        out = qctx.tap(s.prefix, "out", out)
    return out


def _cross_attn(params, prefix: str, x, context, heads: int, d_head: int,
                qctx, kv=None):
    """CrossAttention with TFMQ act-quant sites (cross_attn_forward,
    quant_block.py:214-245). x: (B,Tq,C); context: (B,Tk,Cd) or None.

    ``kv``: optional precomputed ``(k, v)`` in (B,Tk,heads,d_head) — the
    static-context cache (:func:`build_cross_kv`). The reference (and a
    naive port) recomputes ``to_k(context)``/``to_v(context)`` at every
    denoising step even though the text context is constant per prompt
    (attention.py:176-193, recomputed 50x by the samplers); here the
    projections and their act quantization hoist out of the sampler scan
    entirely."""
    q = qfunc.qlinear(qctx, f"{prefix}.to_q", x, params[f"{prefix}.to_q"])
    b, tq, _ = q.shape
    q = q.reshape(b, tq, heads, d_head)
    if kv is not None:
        k, v = kv
    else:
        ctx = x if context is None else context
        k = qfunc.qlinear(qctx, f"{prefix}.to_k", ctx,
                          params[f"{prefix}.to_k"])
        v = qfunc.qlinear(qctx, f"{prefix}.to_v", ctx,
                          params[f"{prefix}.to_v"])
        tk = k.shape[1]
        k = k.reshape(b, tk, heads, d_head)
        v = v.reshape(b, tk, heads, d_head)
    out = attn_ops.qsm_attention(
        q, k, v, d_head ** -0.5, qctx,
        {"q": f"{prefix}.aqtizer_q", "k": f"{prefix}.aqtizer_k",
         "v": f"{prefix}.aqtizer_v", "w": f"{prefix}.aqtizer_w"},
        out_dtype=x.dtype)
    out = out.reshape(b, tq, heads * d_head)
    return qfunc.qlinear(qctx, f"{prefix}.to_out.0", out,
                         params[f"{prefix}.to_out.0"])


def _transformer_block(params, prefix: str, x, context, heads, d_head,
                       qctx, kv_cache=None):
    """BasicTransformerBlock._forward (attention.py:209-213)."""
    if qctx is not None:
        qctx.tap(prefix, "in", (x, context))
    x = _cross_attn(params, f"{prefix}.attn1",
                    _lnorm(params[f"{prefix}.norm1"], x), None, heads,
                    d_head, qctx) + x
    kv = None if (kv_cache is None or context is None) else \
        kv_cache.get(f"{prefix}.attn2")
    x = _cross_attn(params, f"{prefix}.attn2",
                    _lnorm(params[f"{prefix}.norm2"], x), context, heads,
                    d_head, qctx, kv=kv) + x
    h = _lnorm(params[f"{prefix}.norm3"], x)
    h = qfunc.qlinear(qctx, f"{prefix}.ff.net.0.proj", h,
                      params[f"{prefix}.ff.net.0.proj"])
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    h = qfunc.qlinear(qctx, f"{prefix}.ff.net.2", h,
                      params[f"{prefix}.ff.net.2"])
    x = h + x
    if qctx is not None:
        x = qctx.tap(prefix, "out", x)
    return x


def _strans_forward(params, s: Sub, x, context, qctx, kv_cache=None):
    """SpatialTransformer.forward (attention.py:241-260)."""
    b, hh, ww, c = x.shape
    x_in = x
    h = _norm(params[f"{s.prefix}.norm"], x)
    name_in = f"{s.prefix}.proj_in"
    if qctx is not None:
        qctx.tap(name_in, "in", (h,))
    h = qfunc.qconv2d(qctx, name_in, h, params[name_in], padding="VALID")
    if qctx is not None:
        h = qctx.tap(name_in, "out", h)
    inner = s.heads * s.d_head
    h = h.reshape(b, hh * ww, inner)
    for d in range(s.depth):
        h = _transformer_block(params, f"{s.prefix}.transformer_blocks.{d}",
                               h, context, s.heads, s.d_head, qctx,
                               kv_cache=kv_cache)
    h = h.reshape(b, hh, ww, inner)
    name_out = f"{s.prefix}.proj_out"
    if qctx is not None:
        qctx.tap(name_out, "in", (h,))
    h = qfunc.qconv2d(qctx, name_out, h, params[name_out], padding="VALID")
    if qctx is not None:
        h = qctx.tap(name_out, "out", h)
    return h + x_in


def _downsample(params, s: Sub, x):
    p = params[f"{s.prefix}.op"]
    return fnn.conv2d(x, p["w"], p.get("b"), stride=2,
                      padding=((1, 1), (1, 1)))


def _upsample(params, s: Sub, x, qctx):
    x = fnn.nearest_upsample_2x(x)
    name = f"{s.prefix}.conv"
    if qctx is not None:
        qctx.tap(name, "in", (x,))
    x = qfunc.qconv2d(qctx, name, x, params[name])
    if qctx is not None:
        x = qctx.tap(name, "out", x)
    return x


def time_embedding(params, cfg: LDMUNetConfig, t: jax.Array,
                   y: Optional[jax.Array] = None,
                   qctx: Optional[QuantCtx] = None) -> jax.Array:
    """time_embed MLP + optional label embedding (openaimodel.py:744-760).
    Quant sites time_embed.{0,2}."""
    emb = fnn.timestep_embedding_ldm(t, cfg.model_channels)
    emb = qfunc.qlinear(qctx, "time_embed.0", emb, params["time_embed.0"])
    emb = fnn.swish(emb)
    emb = qfunc.qlinear(qctx, "time_embed.2", emb, params["time_embed.2"])
    if cfg.num_classes is not None:
        assert y is not None
        emb = emb + params["label_emb"]["w"][y]
    return emb


def tib_forward(params, cfg: LDMUNetConfig, t: jax.Array,
                y: Optional[jax.Array] = None,
                qctx: Optional[QuantCtx] = None) -> Tuple[jax.Array, ...]:
    """Temporal Information Block: time_embed + every emb_layers
    projection (QuantTemporalInformationBlock.forward,
    quant_block.py:101-115)."""
    emb = time_embedding(params, cfg, t, y, qctx)
    silu = fnn.swish(emb)
    outs = []
    for kind, name, shape in iter_layers(cfg):
        if name.endswith("emb_layers.1"):
            outs.append(qfunc.qlinear(qctx, name, silu, params[name]))
    return tuple(outs)


def apply(params: Dict[str, dict], cfg: LDMUNetConfig, x: jax.Array,
          t: jax.Array, context: Optional[jax.Array] = None,
          y: Optional[jax.Array] = None,
          qctx: Optional[QuantCtx] = None,
          kv_cache: Optional[Dict[str, tuple]] = None) -> jax.Array:
    """UNetModel.forward (openaimodel.py:744-780). x: (B,H,W,C) NHWC;
    t: (B,); context: (B,T,Cd) for cross-attention; y: (B,) labels.
    ``kv_cache``: static-context cross-attn K/V from
    :func:`build_cross_kv` (context constant over sampler steps)."""
    emb = time_embedding(params, cfg, t, y, qctx)
    silu_emb = fnn.swish(emb)

    def run_sub(s: Sub, h):
        if s.kind == "conv":
            if qctx is not None:
                qctx.tap(s.prefix, "in", (h,))
            h = qfunc.qconv2d(qctx, s.prefix, h, params[s.prefix])
            if qctx is not None:
                h = qctx.tap(s.prefix, "out", h)
            return h
        if s.kind == "res":
            eo = res_emb_out(params, cfg, s.prefix, silu_emb, qctx)
            return _res_forward(params, cfg, s, h, eo, qctx)
        if s.kind == "attn":
            return _attn_forward(params, s, h, qctx)
        if s.kind == "strans":
            return _strans_forward(params, s, h, context, qctx,
                                   kv_cache=kv_cache)
        if s.kind == "down":
            return _downsample(params, s, h)
        if s.kind == "up":
            return _upsample(params, s, h, qctx)
        raise ValueError(s.kind)

    inputs, middle, outputs = build_structure(cfg)
    hs = []
    h = x
    for group in inputs:
        for s in group:
            h = run_sub(s, h)
        hs.append(h)
    for s in middle:
        h = run_sub(s, h)
    for group in outputs:
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for s in group:
            h = run_sub(s, h)
    h = _norm(params["out.0"], h)
    h = fnn.swish(h)
    return qfunc.qconv2d(qctx, "out.2", h, params["out.2"])


def cross_attn_prefixes(cfg: LDMUNetConfig) -> List[str]:
    """Dotted prefixes of every context-fed cross-attention (attn2) in
    forward order — the keys of a :func:`build_cross_kv` cache."""
    inputs, middle, outputs = build_structure(cfg)
    out = []
    for group in list(inputs) + [middle] + list(outputs):
        for s in group:
            if s.kind != "strans":
                continue
            for d in range(s.depth):
                out.append(f"{s.prefix}.transformer_blocks.{d}.attn2")
    return out


def build_cross_kv(params: Dict[str, dict], cfg: LDMUNetConfig,
                   context: jax.Array,
                   qctx: Optional[QuantCtx] = None) -> Dict[str, tuple]:
    """Precompute every cross-attention K/V projection of a CONSTANT
    context — once per prompt instead of once per denoising step.

    The reference recomputes ``to_k(context)``/``to_v(context)`` (and,
    quantized, re-fake-quants the context) inside each of the sampler's
    50 steps (attention.py:176-193 via openaimodel.py:744-780); hoisting
    them out of the step is free restructuring because the text/class
    context never changes within a rollout. Under FSC the to_k/to_v
    input quantizers become timestep-STATIC sites: their input does not
    depend on t, so per-timestep calibration observes the same data in
    every group and collapses to one set of params — the cache is built
    with one designated FSC group (callers pass a group-sliced ``qctx``)
    and both the fake-quant sim and the deployed path use the same
    cache, preserving bit-exactness between them.

    Returns {attn2_prefix: (k, v)} with k/v in (B, Tk, heads, d_head).
    """
    inputs, middle, outputs = build_structure(cfg)
    cache: Dict[str, tuple] = {}
    b, tk = context.shape[0], context.shape[1]
    for group in list(inputs) + [middle] + list(outputs):
        for s in group:
            if s.kind != "strans":
                continue
            for d in range(s.depth):
                prefix = f"{s.prefix}.transformer_blocks.{d}.attn2"
                k = qfunc.qlinear(qctx, f"{prefix}.to_k", context,
                                  params[f"{prefix}.to_k"])
                v = qfunc.qlinear(qctx, f"{prefix}.to_v", context,
                                  params[f"{prefix}.to_v"])
                cache[prefix] = (k.reshape(b, tk, s.heads, s.d_head),
                                 v.reshape(b, tk, s.heads, s.d_head))
    return cache


def diffusion_wrapper(params: Dict[str, dict], cfg: LDMUNetConfig,
                      conditioning_key: Optional[str], x: jax.Array,
                      t: jax.Array, c_concat=None, c_crossattn=None,
                      qctx: Optional[QuantCtx] = None) -> jax.Array:
    """DiffusionWrapper.forward conditioning dispatch (ddpm.py:1395-1424)
    as a pure function. ``c_concat``/``c_crossattn``: lists of arrays
    (NHWC for concat; (B,T,Cd) for crossattn; adm takes class ids in
    c_crossattn[0]). The reference's per-step FSC ``load_state_dict``
    swap (ddpm.py:1403-1405) does not live here — FSC params are batched
    arrays sliced inside the jitted sampler (quant/inference.py)."""
    assert conditioning_key in (None, "none", "concat", "crossattn",
                                "hybrid", "adm"), conditioning_key
    if conditioning_key in (None, "none"):
        return apply(params, cfg, x, t, qctx=qctx)
    if conditioning_key == "concat":
        xc = jnp.concatenate([x] + list(c_concat), axis=-1)
        return apply(params, cfg, xc, t, qctx=qctx)
    if conditioning_key == "crossattn":
        cc = jnp.concatenate(list(c_crossattn), axis=1)
        return apply(params, cfg, x, t, context=cc, qctx=qctx)
    if conditioning_key == "hybrid":
        xc = jnp.concatenate([x] + list(c_concat), axis=-1)
        cc = jnp.concatenate(list(c_crossattn), axis=1)
        return apply(params, cfg, xc, t, context=cc, qctx=qctx)
    # adm: class ids -> label_emb added to the time embedding
    return apply(params, cfg, x, t, y=c_crossattn[0], qctx=qctx)


# ---------------------------------------------------------------------------
# Quantizable call-site inventory (module order)
# ---------------------------------------------------------------------------

def layer_infos(cfg: LDMUNetConfig, use_aq: bool = False
                ) -> List[LayerInfo]:
    """Replicates quant_module exclusions (quant_model.py:57-58): no
    skip_connection ('skip'), no Downsample op ('op'); Upsample convs ARE
    wrapped; emb_layers.1 tagged quant_emb. Act sites follow the quant
    block wrappers; AttentionBlock matmul sites exist only when
    ``use_aq`` (b2qb registry, quant_block.py:508-520)."""
    infos: List[LayerInfo] = []
    for kind, name, shape in iter_layers(cfg):
        if kind in ("norm", "lnorm", "embed", "conv_fp", "conv_ds"):
            continue
        lk = "conv" if kind == "conv" else "linear"
        infos.append(LayerInfo(
            name=name, kind=lk,
            quant_emb=name.endswith("emb_layers.1"),
            unit=None))
        if name.endswith(".qkv") and use_aq:
            base = name.rsplit(".", 1)[0]
            infos.append(LayerInfo(name=f"{base}.attention.qkv_matmul"
                                   ".aqtizer_q", kind="act"))
            infos.append(LayerInfo(name=f"{base}.attention.qkv_matmul"
                                   ".aqtizer_k", kind="act"))
            infos.append(LayerInfo(name=f"{base}.attention.smv_matmul"
                                   ".aqtizer_w", kind="act", softmax=True))
            infos.append(LayerInfo(name=f"{base}.attention.smv_matmul"
                                   ".aqtizer_v", kind="act"))
        if name.endswith(".to_v"):
            attn = name.rsplit(".", 1)[0]
            for tag, sm in (("aqtizer_q", False), ("aqtizer_k", False),
                            ("aqtizer_v", False), ("aqtizer_w", True)):
                infos.append(LayerInfo(name=f"{attn}.{tag}", kind="act",
                                       softmax=sm))
    return infos
