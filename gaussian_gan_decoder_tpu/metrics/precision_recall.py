"""Improved precision/recall (ref PanoHead/metrics/precision_recall.py):
manifold membership via k-NN radii."""
from __future__ import annotations

import numpy as np


def _knn_radii(feats: np.ndarray, k: int, batch: int = 1024) -> np.ndarray:
    n = feats.shape[0]
    radii = np.zeros(n, np.float64)
    for i in range(0, n, batch):
        d = np.linalg.norm(feats[i:i + batch, None, :] - feats[None, :, :], axis=-1)
        radii[i:i + batch] = np.sort(d, axis=1)[:, k]  # k-th NN (0 is self)
    return radii


def _fraction_in_manifold(probes, manifold, radii, batch: int = 1024) -> float:
    hits = 0
    for i in range(0, probes.shape[0], batch):
        d = np.linalg.norm(probes[i:i + batch, None, :] - manifold[None, :, :], axis=-1)
        hits += np.any(d <= radii[None, :], axis=1).sum()
    return hits / probes.shape[0]


def precision_recall(real: np.ndarray, gen: np.ndarray, nhood_size: int = 3):
    """-> (precision, recall)."""
    r_radii = _knn_radii(real, nhood_size)
    g_radii = _knn_radii(gen, nhood_size)
    precision = _fraction_in_manifold(gen, real, r_radii)
    recall = _fraction_in_manifold(real, gen, g_radii)
    return float(precision), float(recall)
