"""Evaluation metrics.

The reference computes IS/FID/sFID with *external* tools over dumped
npz/PNG samples (README.md:132; SURVEY.md §4). We keep that protocol (the
sampling pipeline writes compatible npz) and additionally provide:

- :func:`fid_from_stats` — the Frechet distance given two Gaussian
  moments (usable with any feature extractor, e.g. torch-fidelity's
  saved stats or a JAX Inception port);
- :func:`activation_stats` — (mu, sigma) over features from a
  user-supplied extractor fn;
- cheap sanity metrics (PSNR / SQNR) used by the quantization tests to
  compare quantized vs FP samplers without an Inception network.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def fid_from_stats(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                   sigma2: np.ndarray, eps: float = 1e-6) -> float:
    """Frechet distance ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def activation_stats(images: np.ndarray,
                     extractor: Callable[[np.ndarray], np.ndarray],
                     batch_size: int = 64
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of extractor features over an image set."""
    feats = []
    for i in range(0, len(images), batch_size):
        feats.append(np.asarray(extractor(images[i:i + batch_size])))
    f = np.concatenate(feats)
    return f.mean(axis=0), np.cov(f, rowvar=False)


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def sqnr_db(fp: np.ndarray, quant: np.ndarray) -> float:
    """Signal-to-quantization-noise ratio in dB."""
    fp = np.asarray(fp, np.float64)
    err = fp - np.asarray(quant, np.float64)
    return 10.0 * np.log10(np.sum(fp ** 2) / max(np.sum(err ** 2), 1e-20))
