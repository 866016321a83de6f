"""Pretrained-DDPM checkpoint resolution with md5 verification.

Parity with the reference's auto-download helper
(ddim/functions/ckpt_util.py:5-72): known checkpoint names map to the
Heidelberg-hosted pretrained DDPM weights; a cached local file is
verified by md5 before use. The registry values (URLs / cache paths /
md5 digests) are the published facts the reference relies on.

Download is gated: environments without egress (TPU pods often have
none) get a clear error telling the user where to place the file
instead of a hung request. Set ``TFMQ_ALLOW_DOWNLOAD=1`` to enable the
urllib fetch.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

URLS = {
    "cifar10": "https://heibox.uni-heidelberg.de/f/869980b53bf5416c8a28/?dl=1",
    "ema_cifar10": "https://heibox.uni-heidelberg.de/f/2e4f01e2d9ee49bab1d5/?dl=1",
    "lsun_bedroom": "https://heibox.uni-heidelberg.de/f/f179d4f21ebc4d43bbfe/?dl=1",
    "ema_lsun_bedroom": "https://heibox.uni-heidelberg.de/f/b95206528f384185889b/?dl=1",
    "lsun_cat": "https://heibox.uni-heidelberg.de/f/fac870bd988348eab88e/?dl=1",
    "ema_lsun_cat": "https://heibox.uni-heidelberg.de/f/0701aac3aa69457bbe34/?dl=1",
    "lsun_church": "https://heibox.uni-heidelberg.de/f/2711a6f712e34b06b9d8/?dl=1",
    "ema_lsun_church": "https://heibox.uni-heidelberg.de/f/44ccb50ef3c6436db52e/?dl=1",
}

CACHE_PATHS = {
    "cifar10": "diffusion_cifar10_model/model-790000.ckpt",
    "ema_cifar10": "ema_diffusion_cifar10_model/model-790000.ckpt",
    "lsun_bedroom": "diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "ema_lsun_bedroom":
        "ema_diffusion_lsun_bedroom_model/model-2388000.ckpt",
    "lsun_cat": "diffusion_lsun_cat_model/model-1761000.ckpt",
    "ema_lsun_cat": "ema_diffusion_lsun_cat_model/model-1761000.ckpt",
    "lsun_church": "diffusion_lsun_church_model/model-4432000.ckpt",
    "ema_lsun_church":
        "ema_diffusion_lsun_church_model/model-4432000.ckpt",
}

MD5S = {
    "cifar10": "82ed3067fd1002f5cf4c339fb80c4669",
    "ema_cifar10": "1fa350b952534ae442b1d5235cce5cd3",
    "lsun_bedroom": "f70280ac0e08b8e696f42cb8e948ff1c",
    "ema_lsun_bedroom": "1921fa46b66a3665e450e42f36c2720f",
    "lsun_cat": "bbee0e7c3d7abfb6e2539eaf2fb9987b",
    "ema_lsun_cat": "646f23f4821f2459b8bafc57fd824558",
    "lsun_church": "eb619b8a5ab95ef80f94ce8a5488dae3",
    "ema_lsun_church": "fdc68a23938c2397caba4a260bc2445f",
}


def md5_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def get_ckpt_path(name: str, root: Optional[str] = None,
                  check: bool = False) -> str:
    """Resolve (and verify) a named pretrained checkpoint. ``name``
    accepts the reference aliases (``ema_lsun_church_outdoor`` ->
    ``ema_lsun_church``, ckpt_util.py:59-60)."""
    if "church_outdoor" in name:
        name = name.replace("church_outdoor", "church")
    if name not in URLS:
        raise KeyError(
            f"unknown checkpoint '{name}'; known: {sorted(URLS)}")
    root = root or os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "diffusion_models_converted")
    path = os.path.join(root, CACHE_PATHS[name])
    ok = os.path.exists(path) and (
        not check or md5_of(path) == MD5S[name])
    if not ok:
        if not os.environ.get("TFMQ_ALLOW_DOWNLOAD"):
            raise FileNotFoundError(
                f"checkpoint '{name}' not found (or failed md5) at "
                f"{path}. This environment may have no egress; place "
                f"the file there manually (source: {URLS[name]}) or "
                f"set TFMQ_ALLOW_DOWNLOAD=1.")
        logger.info("downloading %s -> %s", URLS[name], path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        import urllib.request
        urllib.request.urlretrieve(URLS[name], path)
        digest = md5_of(path)
        if digest != MD5S[name]:
            raise IOError(
                f"md5 mismatch for {name}: got {digest}, "
                f"expected {MD5S[name]}")
    return path
