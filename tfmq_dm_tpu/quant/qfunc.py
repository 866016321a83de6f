"""Quantized call-site wrappers.

Each quantizable op in a model goes through one of these with its unique
layer name. They replace the reference's QuantLayer.forward
(quant_layer.py:306-340): optional input fake-quant -> (quantized or FP)
weight -> conv/linear.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..ops import nn as fnn
from .context import QuantCtx


def qconv2d(qctx: Optional[QuantCtx], name: str, x: jax.Array,
            params: dict, stride: int = 1, padding="SAME") -> jax.Array:
    w, b = params["w"], params.get("b")
    if qctx is not None:
        x = qctx.qact(name, x)
        w = qctx.qweight(name, w)
    return fnn.conv2d(x, w, b, stride=stride, padding=padding)


def qlinear(qctx: Optional[QuantCtx], name: str, x: jax.Array,
            params: dict) -> jax.Array:
    w, b = params["w"], params.get("b")
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
