"""Frechet distance (FID) (ref PanoHead/metrics/frechet_inception_distance.py)."""
from __future__ import annotations

import numpy as np
import scipy.linalg

from .feature_stats import FeatureStats


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    m = np.square(mu1 - mu2).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(cov1, cov2), disp=False)
    return float(np.real(m + np.trace(cov1 + cov2 - s * 2)))


def fid_from_stats(real: FeatureStats, gen: FeatureStats) -> float:
    mu_r, cov_r = real.get_mean_cov()
    mu_g, cov_g = gen.get_mean_cov()
    return frechet_distance(mu_g, cov_g, mu_r, cov_r)
