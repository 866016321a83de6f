"""First-stage VAE (AutoencoderKL / VQModel) encoder+decoder — functional
JAX, NHWC.

Re-implements /root/reference/stable-diffusion/ldm/modules/
diffusionmodules/model.py:368-570 (Encoder/Decoder; ResnetBlock without
temb since temb_channels=0, AttnBlock) and ldm/models/autoencoder.py
(AutoencoderKL decode :285-443, VQModelInterface decode :264-283 with
nearest-codebook quantize). The first stage is kept full-precision —
TFMQ quantizes only the denoising UNet.

Param names match the torch checkpoints' ``first_stage_model.*`` keys
(decoder.*, encoder.*, quant_conv, post_quant_conv, quantize.embedding).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn as fnn


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """ddconfig subset (e.g. models/ldm/celeba256/config.yaml)."""

    ch: int = 128
    out_ch: int = 3
    in_channels: int = 3
    z_channels: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    resolution: int = 256
    double_z: bool = False
    # container level:
    embed_dim: int = 3
    vq: bool = True               # VQModelInterface vs AutoencoderKL
    n_embed: int = 8192
    scale_factor: float = 1.0     # LatentDiffusion scale_factor


def sd_vae_config() -> VAEConfig:
    return VAEConfig(ch=128, out_ch=3, in_channels=3, z_channels=4,
                     ch_mult=(1, 2, 4, 4), num_res_blocks=2,
                     attn_resolutions=(), resolution=256, double_z=True,
                     embed_dim=4, vq=False, scale_factor=0.18215)


def tiny_vae_config(**kw) -> VAEConfig:
    d = dict(ch=32, out_ch=3, in_channels=3, z_channels=3,
             ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
             resolution=16, double_z=False, embed_dim=3, vq=True,
             n_embed=32)
    d.update(kw)
    return VAEConfig(**d)


# ---------------------------------------------------------------------------
# layer inventory (decoder + encoder + container convs)
# ---------------------------------------------------------------------------

def _res_shapes(prefix, c_in, c_out):
    yield ("norm", f"{prefix}.norm1", c_in)
    yield ("conv", f"{prefix}.conv1", (3, 3, c_in, c_out))
    yield ("norm", f"{prefix}.norm2", c_out)
    yield ("conv", f"{prefix}.conv2", (3, 3, c_out, c_out))
    if c_in != c_out:
        yield ("conv", f"{prefix}.nin_shortcut", (1, 1, c_in, c_out))


def _attn_shapes(prefix, c):
    yield ("norm", f"{prefix}.norm", c)
    for n in ("q", "k", "v", "proj_out"):
        yield ("conv", f"{prefix}.{n}", (1, 1, c, c))


def iter_decoder_layers(cfg: VAEConfig):
    nres = len(cfg.ch_mult)
    block_in = cfg.ch * cfg.ch_mult[-1]
    curr_res = cfg.resolution // 2 ** (nres - 1)
    yield ("conv", "decoder.conv_in", (3, 3, cfg.z_channels, block_in))
    yield from _res_shapes("decoder.mid.block_1", block_in, block_in)
    yield from _attn_shapes("decoder.mid.attn_1", block_in)
    yield from _res_shapes("decoder.mid.block_2", block_in, block_in)
    for i in reversed(range(nres)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            yield from _res_shapes(f"decoder.up.{i}.block.{j}", block_in,
                                   block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                yield from _attn_shapes(f"decoder.up.{i}.attn.{j}",
                                        block_in)
        if i != 0:
            yield ("conv", f"decoder.up.{i}.upsample.conv",
                   (3, 3, block_in, block_in))
            curr_res *= 2
    yield ("norm", "decoder.norm_out", block_in)
    yield ("conv", "decoder.conv_out", (3, 3, block_in, cfg.out_ch))


def iter_encoder_layers(cfg: VAEConfig):
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    nres = len(cfg.ch_mult)
    curr_res = cfg.resolution
    yield ("conv", "encoder.conv_in", (3, 3, cfg.in_channels, cfg.ch))
    block_in = cfg.ch
    for i in range(nres):
        block_in = cfg.ch * in_ch_mult[i]
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks):
            yield from _res_shapes(f"encoder.down.{i}.block.{j}",
                                   block_in, block_out)
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                yield from _attn_shapes(f"encoder.down.{i}.attn.{j}",
                                        block_in)
        if i != nres - 1:
            yield ("conv", f"encoder.down.{i}.downsample.conv",
                   (3, 3, block_in, block_in))
            curr_res //= 2
    yield from _res_shapes("encoder.mid.block_1", block_in, block_in)
    yield from _attn_shapes("encoder.mid.attn_1", block_in)
    yield from _res_shapes("encoder.mid.block_2", block_in, block_in)
    yield ("norm", "encoder.norm_out", block_in)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    yield ("conv", "encoder.conv_out", (3, 3, block_in, zc))


def iter_layers(cfg: VAEConfig, encoder: bool = True):
    yield from iter_decoder_layers(cfg)
    if encoder:
        yield from iter_encoder_layers(cfg)
    zc = cfg.z_channels
    ed = cfg.embed_dim
    if cfg.vq:
        yield ("conv", "quant_conv", (1, 1, zc, ed))
        yield ("conv", "post_quant_conv", (1, 1, ed, zc))
        yield ("embed", "quantize.embedding", (cfg.n_embed, ed))
    else:
        dzc = 2 * zc if cfg.double_z else zc
        yield ("conv", "quant_conv", (1, 1, dzc, 2 * ed))
        yield ("conv", "post_quant_conv", (1, 1, ed, zc))


def init_params(key, cfg: VAEConfig, encoder: bool = True,
                dtype=jnp.float32) -> Dict[str, dict]:
    params = {}
    for kind, name, shape in iter_layers(cfg, encoder):
        if kind == "norm":
            params[name] = {"scale": jnp.ones((shape,), dtype),
                            "bias": jnp.zeros((shape,), dtype)}
        elif kind == "embed":
            key, k = jax.random.split(key)
            params[name] = {"w": jax.random.normal(k, shape, dtype)
                            / shape[1]}
        else:
            key, k1, k2 = jax.random.split(key, 3)
            fan_in = shape[0] * shape[1] * shape[2]
            b = 1.0 / jnp.sqrt(fan_in)
            params[name] = {
                "w": jax.random.uniform(k1, shape, dtype, -b, b),
                "b": jax.random.uniform(k2, (shape[-1],), dtype, -b, b)}
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _norm(p, x):
    return fnn.group_norm(x, p["scale"], p["bias"], groups=32, eps=1e-6)


def _conv(params, name, x, padding="SAME", stride=1):
    p = params[name]
    return fnn.conv2d(x, p["w"], p.get("b"), stride=stride,
                      padding=padding)


def _res(params, prefix, x):
    h = fnn.swish(_norm(params[f"{prefix}.norm1"], x))
    h = _conv(params, f"{prefix}.conv1", h)
    h = fnn.swish(_norm(params[f"{prefix}.norm2"], h))
    h = _conv(params, f"{prefix}.conv2", h)
    if f"{prefix}.nin_shortcut" in params:
        x = _conv(params, f"{prefix}.nin_shortcut", x, padding="VALID")
    return x + h


def _attn(params, prefix, x):
    b, h, w, c = x.shape
    h_ = _norm(params[f"{prefix}.norm"], x)
    q = _conv(params, f"{prefix}.q", h_, padding="VALID").reshape(
        b, h * w, c)
    k = _conv(params, f"{prefix}.k", h_, padding="VALID").reshape(
        b, h * w, c)
    v = _conv(params, f"{prefix}.v", h_, padding="VALID").reshape(
        b, h * w, c)
    attn = jax.nn.softmax(
        jnp.einsum("bic,bjc->bij", q, k,
                   preferred_element_type=jnp.float32) * (c ** -0.5),
        axis=2).astype(x.dtype)
    o = jnp.einsum("bij,bjc->bic", attn, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, h, w, c)
    return x + _conv(params, f"{prefix}.proj_out", o, padding="VALID")


def decoder_apply(params, cfg: VAEConfig, z: jax.Array,
                  tanh_out: bool = False) -> jax.Array:
    """Decoder.forward (model.py:553-600ish). z: (B,h,w,z_channels)."""
    nres = len(cfg.ch_mult)
    curr_res = cfg.resolution // 2 ** (nres - 1)
    h = _conv(params, "decoder.conv_in", z)
    h = _res(params, "decoder.mid.block_1", h)
    h = _attn(params, "decoder.mid.attn_1", h)
    h = _res(params, "decoder.mid.block_2", h)
    for i in reversed(range(nres)):
        for j in range(cfg.num_res_blocks + 1):
            h = _res(params, f"decoder.up.{i}.block.{j}", h)
            if curr_res in cfg.attn_resolutions:
                h = _attn(params, f"decoder.up.{i}.attn.{j}", h)
        if i != 0:
            h = fnn.nearest_upsample_2x(h)
            h = _conv(params, f"decoder.up.{i}.upsample.conv", h)
            curr_res *= 2
    h = fnn.swish(_norm(params["decoder.norm_out"], h))
    h = _conv(params, "decoder.conv_out", h)
    return jnp.tanh(h) if tanh_out else h


def encoder_apply(params, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """Encoder.forward (model.py:436-466). Returns moments/latent."""
    nres = len(cfg.ch_mult)
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution
    h = _conv(params, "encoder.conv_in", x)
    for i in range(nres):
        for j in range(cfg.num_res_blocks):
            h = _res(params, f"encoder.down.{i}.block.{j}", h)
            if curr_res in cfg.attn_resolutions:
                h = _attn(params, f"encoder.down.{i}.attn.{j}", h)
        if i != nres - 1:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = _conv(params, f"encoder.down.{i}.downsample.conv", h,
                      padding="VALID", stride=2)
            curr_res //= 2
    h = _res(params, "encoder.mid.block_1", h)
    h = _attn(params, "encoder.mid.attn_1", h)
    h = _res(params, "encoder.mid.block_2", h)
    h = fnn.swish(_norm(params["encoder.norm_out"], h))
    return _conv(params, "encoder.conv_out", h)


def vq_lookup(params, z: jax.Array) -> jax.Array:
    """Nearest-codebook quantization (VectorQuantizer2) used by
    VQModelInterface.decode (autoencoder.py:274-283)."""
    emb = params["quantize.embedding"]["w"]          # (n_embed, ed)
    flat = z.reshape(-1, z.shape[-1])
    d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
         - 2.0 * flat @ emb.T
         + jnp.sum(emb ** 2, axis=1)[None, :])
    idx = jnp.argmin(d, axis=1)
    return emb[idx].reshape(z.shape)


def decode(params, cfg: VAEConfig, z: jax.Array,
           force_not_quantize: bool = False) -> jax.Array:
    """LatentDiffusion.decode_first_stage (ddpm.py:706-743, minus the
    unused split-patching path): undo scale_factor, (VQ-quantize),
    post_quant_conv, Decoder."""
    z = z / cfg.scale_factor
    if cfg.vq and not force_not_quantize:
        z = vq_lookup(params, z)
    z = _conv(params, "post_quant_conv", z, padding="VALID")
    return decoder_apply(params, cfg, z)


def encode_kl_mode(params, cfg: VAEConfig, x: jax.Array) -> jax.Array:
    """AutoencoderKL.encode(...).mode() * scale_factor — the
    deterministic latent used by get_first_stage_encoding."""
    moments = encoder_apply(params, cfg, x)
    moments = _conv(params, "quant_conv", moments, padding="VALID")
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean * cfg.scale_factor
