"""Kernel Inception Distance (ref PanoHead/metrics/kernel_inception_distance.py):
polynomial-kernel MMD^2 over feature subsets."""
from __future__ import annotations

import numpy as np


def kid_from_features(
    real: np.ndarray, gen: np.ndarray,
    num_subsets: int = 100, max_subset_size: int = 1000, seed: int = 0,
) -> float:
    n = real.shape[1]
    m = min(min(real.shape[0], gen.shape[0]), max_subset_size)
    rng = np.random.RandomState(seed)
    t = 0.0
    for _ in range(num_subsets):
        x = gen[rng.choice(gen.shape[0], m, replace=False)]
        y = real[rng.choice(real.shape[0], m, replace=False)]
        a = (x @ x.T / n + 1) ** 3 + (y @ y.T / n + 1) ** 3
        b = (x @ y.T / n + 1) ** 3
        t += (a.sum() - np.trace(a)) / (m - 1) - b.sum() * 2 / m
    return float(t / num_subsets / m)
