"""Quantized call-site wrappers.

Each quantizable op in a model goes through one of these with its unique
layer name. They replace the reference's QuantLayer.forward
(quant_layer.py:306-340): optional input fake-quant -> (quant or FP)
weight -> conv/linear.

In DEPLOY mode (qctx.deploy, see quant/deploy.py) the same call sites
execute real int8 convs/matmuls on the MXU instead of fake-quant + fp —
the capability the reference outsources to OpenVINO (README.md:132).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import int_ops
from ..ops import nn as fnn
from .context import QuantCtx


def _same_pads(kh: int, kw: int):
    return ((kh // 2, kh // 2), (kw // 2, kw // 2))


def qconv2d(qctx: Optional[QuantCtx], name: str, x: jax.Array,
            params: dict, stride: int = 1, padding="SAME") -> jax.Array:
    w, b = params["w"], params.get("b")
    if qctx is not None and qctx.deploy is not None and \
            name in qctx.deploy:
        iw = qctx.deploy[name]
        pol = qctx.policy.get(name)
        ast = qctx.astate.get(name) if qctx.use_aq and pol.aq else None
        out_dtype = qctx.act_out_dtype or x.dtype
        if isinstance(iw, int_ops.FPWeight):
            # >8-bit weight grid: offline-fake-quantized weights, fp conv
            if ast is not None:
                from .quantizer import fake_quant
                x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
            return fnn.conv2d(x, iw.w.astype(out_dtype), b,
                              stride=stride, padding=padding)
        from .deploy import Int4ConvWeight, dequant_int4_conv
        if isinstance(iw, Int4ConvWeight):
            # packed-int4 serving path: acts fake-quant elementwise (if
            # quantized), the conv reads nibble-packed weights (half
            # the int8 weight bandwidth) via the tap-GEMM kernel
            if ast is not None:
                from .quantizer import fake_quant
                x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
            if stride == 1 and padding in ("SAME", "VALID") and \
                    jax.default_backend() == "tpu":
                from ..ops.pallas_kernels import int4_conv2d_dequant
                pads = _same_pads(iw.kh, iw.kw) if padding == "SAME" \
                    else ((0, 0), (0, 0))
                bias = None if b is None else jnp.pad(
                    b, (0, iw.delta.shape[0] - iw.n))
                out = int4_conv2d_dequant(
                    x.astype(jnp.bfloat16), iw.w_packed, iw.delta,
                    iw.zp_c, iw.kh, iw.kw, bias=bias, pads=pads,
                    block_n=iw.block_n, out_dtype=out_dtype)
                return out[..., :iw.n]
            return fnn.conv2d(x, dequant_int4_conv(iw, out_dtype), b,
                              stride=stride, padding=padding)
        kh, kw_ = iw.w_q.shape[:2]
        pads = _same_pads(kh, kw_) if padding == "SAME" else \
            ((0, 0), (0, 0)) if padding == "VALID" else tuple(padding)
        if qctx.shape_tape is not None:
            qctx.shape_tape[name] = (tuple(x.shape[1:3]), stride, pads)
        if ast is not None and int_ops.fits_int8(pol.a_cfg):
            x_q, zp_xc = int_ops.quantize_act_int8(x, ast["delta"],
                                                   ast["zp"], pol.a_cfg)
            return int_ops.int8_conv2d(x_q, zp_xc, ast["delta"], iw, b,
                                       stride=stride, pads=pads,
                                       out_dtype=out_dtype)
        if ast is not None:
            # wide act grid (e.g. a16): codes don't fit int8 — fake-quant
            # the activations and run the conv on dequantized weights
            from .quantizer import fake_quant
            x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
        # weight-only: dequantized weights (loop-invariant, XLA hoists)
        return fnn.conv2d(x, int_ops.dequant_weight(iw, out_dtype), b,
                          stride=stride, padding=padding)
    if qctx is not None:
        x = qctx.qact(name, x)
        w = qctx.qweight(name, w)
    return fnn.conv2d(x, w, b, stride=stride, padding=padding)


def qlinear(qctx: Optional[QuantCtx], name: str, x: jax.Array,
            params: dict) -> jax.Array:
    w, b = params["w"], params.get("b")
    if qctx is not None and qctx.deploy is not None and \
            name in qctx.deploy:
        iw = qctx.deploy[name]
        pol = qctx.policy.get(name)
        ast = qctx.astate.get(name) if qctx.use_aq and pol.aq else None
        out_dtype = qctx.act_out_dtype or x.dtype
        if isinstance(iw, int_ops.FPWeight):
            if ast is not None:
                from .quantizer import fake_quant
                x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
            return fnn.linear(x, iw.w.astype(out_dtype), b)
        from .deploy import Int4Weight, dequant_int4
        if isinstance(iw, Int4Weight):
            # packed 4-bit weights: act fake-quant (if any) stays
            # elementwise; the GEMM reads nibble-packed weights and
            # dequants to bf16 in VMEM (half the weight bandwidth)
            from ..quant.quantizer import fake_quant
            if ast is not None:
                x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
            if jax.default_backend() == "tpu":
                from ..ops.pallas_kernels import int4_matmul_dequant
                lead = x.shape[:-1]
                m = 1
                for s in lead:
                    m *= s
                bias = None if b is None else jnp.pad(
                    b, (0, iw.delta.shape[0] - iw.n))
                out = int4_matmul_dequant(
                    x.reshape(m, iw.k), iw.w_packed, iw.delta, iw.zp_c,
                    bias=bias, block_n=iw.block_n, out_dtype=out_dtype)
                return out[:, :iw.n].reshape(lead + (iw.n,))
            return fnn.linear(x, dequant_int4(iw, out_dtype), b)
        if ast is not None and not int_ops.fits_int8(pol.a_cfg):
            # wide act grid: fake-quant acts, matmul dequantized weights
            from .quantizer import fake_quant
            x = fake_quant(x, ast["delta"], ast["zp"], pol.a_cfg)
            return fnn.linear(x, int_ops.dequant_weight(iw, out_dtype), b)
        if ast is not None:
            # NOTE: two hand-written Pallas GEMMs were benchmarked here
            # and both LOST to XLA's native int8 dot_general (~88% of
            # MXU int8 peak, epilogues fused by the compiler):
            # int8_matmul_fused (quantize in-kernel; re-quantizes per
            # output block) and int8_matmul_pre (pre-quantized codes,
            # corrections fused into the MXU epilogue) — SD v1.4 w8a8
            # step 57 -> 44 / 48 img-steps/s respectively. Both kernels
            # are kept, exactness-tested, for shapes where XLA's
            # scheduling loses (and for the packed-int4 path).
            x_q, zp_xc = int_ops.quantize_act_int8(x, ast["delta"],
                                                   ast["zp"], pol.a_cfg)
            return int_ops.int8_linear(x_q, zp_xc, ast["delta"], iw, b,
                                       out_dtype=out_dtype)
        return fnn.linear(x, int_ops.dequant_weight(iw, out_dtype), b)
    if qctx is not None:
        x = qctx.qact(name, x)
        w = qctx.qweight(name, w)
    return fnn.linear(x, w, b)


def qact(qctx: Optional[QuantCtx], name: str, x: jax.Array) -> jax.Array:
    """Standalone activation quant site (attention matmul inputs,
    softmax outputs), cf. QuantAttnBlock.aqtizer_q/k/v/w."""
    if qctx is None:
        return x
    return qctx.qact(name, x)
