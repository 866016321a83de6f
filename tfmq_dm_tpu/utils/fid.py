"""In-repo FID: the pool3 InceptionV3 feature extractor (JAX) + stats.

The reference computes FID with external tools (torch-fidelity /
guided-diffusion, README.md:132) over npz dumps
(sample_diffusion_ldm.py:180-184). This module makes the metric
self-contained: a JAX port of the FID-standard InceptionV3 ("pt_inception
-2015-12-05", the TF-ported network used by pytorch-fid — NOT vanilla
torchvision inception_v3; the differences are the count_include_pad=False
average pools in the A/C/E blocks and the max-pool branch in the final E
block), a converter from the standard torch weights file, and
mu/sigma -> Frechet distance via utils.metrics.

Weights: this environment is zero-egress and ships no checkpoint, so
real-FID numbers cannot be produced here; point
``TFMQ_INCEPTION_CKPT`` (or the ``weights_path`` argument) at the
standard ``pt_inception-2015-12-05-6726825d.pth`` and
:func:`load_inception_params` converts it — any name or shape mismatch
raises, so a wrong architecture cannot silently produce wrong FIDs. The
npz dump protocol (pipelines/sampling.py ``npz_path``) stays
interoperable with the reference's external-tool flow either way.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# Architecture description (FID InceptionV3)
# ---------------------------------------------------------------------------

def _conv_defs():
    """Yield (name, cin, cout, (kh, kw), stride, (ph, pw)) for every
    BasicConv2d in network order. Channel chaining is asserted in
    init/convert so a transcription slip fails fast."""
    defs = []

    def c(name, cin, cout, k, s=1, p=(0, 0)):
        kh, kw = (k, k) if isinstance(k, int) else k
        defs.append((name, cin, cout, (kh, kw), s, p))

    c("Conv2d_1a_3x3", 3, 32, 3, 2)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 32, 64, 3, 1, (1, 1))
    c("Conv2d_3b_1x1", 64, 80, 1)
    c("Conv2d_4a_3x3", 80, 192, 3)

    def inception_a(pfx, cin, pool):
        c(f"{pfx}.branch1x1", cin, 64, 1)
        c(f"{pfx}.branch5x5_1", cin, 48, 1)
        c(f"{pfx}.branch5x5_2", 48, 64, 5, 1, (2, 2))
        c(f"{pfx}.branch3x3dbl_1", cin, 64, 1)
        c(f"{pfx}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1))
        c(f"{pfx}.branch3x3dbl_3", 96, 96, 3, 1, (1, 1))
        c(f"{pfx}.branch_pool", cin, pool, 1)
        return 64 + 64 + 96 + pool

    def inception_b(pfx, cin):
        c(f"{pfx}.branch3x3", cin, 384, 3, 2)
        c(f"{pfx}.branch3x3dbl_1", cin, 64, 1)
        c(f"{pfx}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1))
        c(f"{pfx}.branch3x3dbl_3", 96, 96, 3, 2)
        return 384 + 96 + cin

    def inception_c(pfx, cin, c7):
        c(f"{pfx}.branch1x1", cin, 192, 1)
        c(f"{pfx}.branch7x7_1", cin, c7, 1)
        c(f"{pfx}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3))
        c(f"{pfx}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0))
        c(f"{pfx}.branch7x7dbl_1", cin, c7, 1)
        c(f"{pfx}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0))
        c(f"{pfx}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3))
        c(f"{pfx}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0))
        c(f"{pfx}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3))
        c(f"{pfx}.branch_pool", cin, 192, 1)
        return 192 * 4

    def inception_d(pfx, cin):
        c(f"{pfx}.branch3x3_1", cin, 192, 1)
        c(f"{pfx}.branch3x3_2", 192, 320, 3, 2)
        c(f"{pfx}.branch7x7x3_1", cin, 192, 1)
        c(f"{pfx}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3))
        c(f"{pfx}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0))
        c(f"{pfx}.branch7x7x3_4", 192, 192, 3, 2)
        return 320 + 192 + cin

    def inception_e(pfx, cin):
        c(f"{pfx}.branch1x1", cin, 320, 1)
        c(f"{pfx}.branch3x3_1", cin, 384, 1)
        c(f"{pfx}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1))
        c(f"{pfx}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0))
        c(f"{pfx}.branch3x3dbl_1", cin, 448, 1)
        c(f"{pfx}.branch3x3dbl_2", 448, 384, 3, 1, (1, 1))
        c(f"{pfx}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1))
        c(f"{pfx}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0))
        c(f"{pfx}.branch_pool", cin, 192, 1)
        return 320 + 768 + 768 + 192

    assert inception_a("Mixed_5b", 192, 32) == 256
    assert inception_a("Mixed_5c", 256, 64) == 288
    assert inception_a("Mixed_5d", 288, 64) == 288
    assert inception_b("Mixed_6a", 288) == 768
    assert inception_c("Mixed_6b", 768, 128) == 768
    assert inception_c("Mixed_6c", 768, 160) == 768
    assert inception_c("Mixed_6d", 768, 160) == 768
    assert inception_c("Mixed_6e", 768, 192) == 768
    assert inception_d("Mixed_7a", 768) == 1280
    assert inception_e("Mixed_7b", 1280) == 2048
    assert inception_e("Mixed_7c", 2048) == 2048
    return defs


CONV_DEFS = _conv_defs()


def init_inception_params(key) -> Dict[str, dict]:
    """Random-init params in the converted layout (testing/mechanics —
    real FID needs the standard weights via load_inception_params)."""
    params = {}
    for name, cin, cout, (kh, kw), _, _ in CONV_DEFS:
        key, k = jax.random.split(key)
        fan_in = cin * kh * kw
        params[name] = {
            "w": jax.random.normal(k, (kh, kw, cin, cout),
                                   jnp.float32) / np.sqrt(fan_in),
            # folded BN: scale/bias after the conv
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }
    return params


def load_inception_params(weights_path: Optional[str] = None
                          ) -> Dict[str, dict]:
    """Convert the standard FID weights file (torch state dict with
    torchvision InceptionV3 names: <block>.conv.weight + BN stats) to
    the JAX layout, folding BatchNorm into a per-channel scale/bias.
    Raises FileNotFoundError when no weights file is available (this
    zero-egress environment ships none)."""
    path = weights_path or os.environ.get("TFMQ_INCEPTION_CKPT", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "FID inception weights not found; set TFMQ_INCEPTION_CKPT "
            "to pt_inception-2015-12-05-6726825d.pth (zero-egress "
            "environments must pre-seed it)")
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = {}
    for name, cin, cout, (kh, kw), _, _ in CONV_DEFS:
        w = np.asarray(sd[f"{name}.conv.weight"])          # (O, I, kh, kw)
        assert w.shape == (cout, cin, kh, kw), (name, w.shape)
        gamma = np.asarray(sd[f"{name}.bn.weight"])
        beta = np.asarray(sd[f"{name}.bn.bias"])
        mean = np.asarray(sd[f"{name}.bn.running_mean"])
        var = np.asarray(sd[f"{name}.bn.running_var"])
        scale = gamma / np.sqrt(var + BN_EPS)
        bias = beta - mean * scale
        params[name] = {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),     # HWIO
            "scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(bias, jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

_DEF_BY_NAME = {d[0]: d for d in CONV_DEFS}


def _bconv(params, name, x):
    """BasicConv2d: conv (no bias) -> folded BN -> relu. NHWC."""
    _, _, _, (kh, kw), stride, (ph, pw) = _DEF_BY_NAME[name]
    p = params[name]
    x = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(x * p["scale"] + p["bias"])


def _maxpool3(x, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avgpool3_nopad(x):
    """3x3 stride-1 avg pool, count_include_pad=False — the FID
    network's pool (pytorch-fid FIDInceptionA/C/E_1)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


def _inception_a(params, pfx, x):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b5 = _bconv(params, f"{pfx}.branch5x5_2",
                _bconv(params, f"{pfx}.branch5x5_1", x))
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_2", b3)
    b3 = _bconv(params, f"{pfx}.branch3x3dbl_3", b3)
    bp = _bconv(params, f"{pfx}.branch_pool", _avgpool3_nopad(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(params, pfx, x):
    b3 = _bconv(params, f"{pfx}.branch3x3", x)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_2", bd)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_3", bd)
    return jnp.concatenate([b3, bd, _maxpool3(x)], axis=-1)


def _inception_c(params, pfx, x):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b7 = _bconv(params, f"{pfx}.branch7x7_1", x)
    b7 = _bconv(params, f"{pfx}.branch7x7_2", b7)
    b7 = _bconv(params, f"{pfx}.branch7x7_3", b7)
    bd = _bconv(params, f"{pfx}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _bconv(params, f"{pfx}.branch7x7dbl_{i}", bd)
    bp = _bconv(params, f"{pfx}.branch_pool", _avgpool3_nopad(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(params, pfx, x):
    b3 = _bconv(params, f"{pfx}.branch3x3_2",
                _bconv(params, f"{pfx}.branch3x3_1", x))
    b7 = _bconv(params, f"{pfx}.branch7x7x3_1", x)
    for i in (2, 3, 4):
        b7 = _bconv(params, f"{pfx}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool3(x)], axis=-1)


def _inception_e(params, pfx, x, pool: str):
    b1 = _bconv(params, f"{pfx}.branch1x1", x)
    b3 = _bconv(params, f"{pfx}.branch3x3_1", x)
    b3 = jnp.concatenate([_bconv(params, f"{pfx}.branch3x3_2a", b3),
                          _bconv(params, f"{pfx}.branch3x3_2b", b3)],
                         axis=-1)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{pfx}.branch3x3dbl_2", bd)
    bd = jnp.concatenate([_bconv(params, f"{pfx}.branch3x3dbl_3a", bd),
                          _bconv(params, f"{pfx}.branch3x3dbl_3b", bd)],
                         axis=-1)
    if pool == "avg":
        xp = _avgpool3_nopad(x)
    else:                       # Mixed_7c: max pool (FIDInceptionE_2)
        xp = _maxpool3(x, stride=1, pad=1)
    bp = _bconv(params, f"{pfx}.branch_pool", xp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _resize_bilinear(x, size=299):
    """torch F.interpolate(mode='bilinear', align_corners=False)
    equivalent — jax.image 'linear' with half-pixel centers matches."""
    b, h, w, c = x.shape
    if (h, w) == (size, size):
        return x
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


@jax.jit
def inception_pool3(params: Dict[str, dict], images: jax.Array
                    ) -> jax.Array:
    """images: (B, H, W, 3) float in [0, 1] -> (B, 2048) pool3 features
    (resize to 299, scale to [-1, 1] — pytorch-fid resize_input +
    normalize_input)."""
    x = _resize_bilinear(images.astype(jnp.float32))
    x = x * 2.0 - 1.0
    x = _bconv(params, "Conv2d_1a_3x3", x)
    x = _bconv(params, "Conv2d_2a_3x3", x)
    x = _bconv(params, "Conv2d_2b_3x3", x)
    x = _maxpool3(x)
    x = _bconv(params, "Conv2d_3b_1x1", x)
    x = _bconv(params, "Conv2d_4a_3x3", x)
    x = _maxpool3(x)
    x = _inception_a(params, "Mixed_5b", x)
    x = _inception_a(params, "Mixed_5c", x)
    x = _inception_a(params, "Mixed_5d", x)
    x = _inception_b(params, "Mixed_6a", x)
    x = _inception_c(params, "Mixed_6b", x)
    x = _inception_c(params, "Mixed_6c", x)
    x = _inception_c(params, "Mixed_6d", x)
    x = _inception_d(params, "Mixed_7a", x)
    x = _inception_e(params, "Mixed_7b", x, pool="avg")
    x = _inception_e(params, "Mixed_7c", x, pool="max")
    return jnp.mean(x, axis=(1, 2))                   # adaptive avg pool


def make_extractor(params):
    """Batched numpy-in/numpy-out extractor for
    utils.metrics.activation_stats."""
    def extract(batch: np.ndarray) -> np.ndarray:
        return np.asarray(inception_pool3(params, jnp.asarray(batch)))
    return extract


def fid_from_npz(npz_a: str, npz_b: str,
                 weights_path: Optional[str] = None,
                 batch_size: int = 64) -> float:
    """FID between two sample dumps (the reference's npz protocol,
    sample_diffusion_ldm.py:180-184: key 'arr_0'/'samples', uint8 or
    [0,1] float)."""
    from .metrics import activation_stats, fid_from_stats

    params = load_inception_params(weights_path)

    def load(p):
        d = np.load(p)
        arr = d[d.files[0]]
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        if arr.shape[1] == 3 and arr.shape[-1] != 3:   # NCHW -> NHWC
            arr = arr.transpose(0, 2, 3, 1)
        return arr

    ext = make_extractor(params)
    mu1, s1 = activation_stats(load(npz_a), ext, batch_size)
    mu2, s2 = activation_stats(load(npz_b), ext, batch_size)
    return fid_from_stats(mu1, s1, mu2, s2)


if __name__ == "__main__":
    # python -m tfmq_dm_tpu.utils.fid samples_a.npz samples_b.npz
    import sys
    print(fid_from_npz(sys.argv[1], sys.argv[2]))
