"""Feature statistics accumulation for GAN metrics.

Re-design of /root/reference/PanoHead/metrics/metric_utils.py (FeatureStats
+ the compute_feature_stats_for_{dataset,generator} loops and eg3d's
decoder path, eg3d/metrics/metric_utils.py:286-322). The reference shards
feature extraction across GPUs with all_gather; here batches stream
through one jitted feature function (shardable over the 'data' mesh axis)
and statistics accumulate in float64 on host.

The reference downloads NVIDIA's torchscript InceptionV3/VGG16 detectors
(zero-egress here): the extractor is pluggable — any `features(images
[0,255] NCHW) -> (N, D)` callable. losses.VGG16LPIPS.embed is the built-in
default; ported Inception weights slot in unchanged.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Optional

import numpy as np


class FeatureStats:
    """(num, mean, cov) accumulation + optional raw capture (ref
    metric_utils.py FeatureStats)."""

    def __init__(self, capture_all: bool = False, capture_mean_cov: bool = True,
                 max_items: Optional[int] = None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = []
        self.raw_mean = None
        self.raw_cov = None

    def is_full(self) -> bool:
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x: np.ndarray):
        x = np.asarray(x, np.float64)
        if self.max_items is not None:
            take = min(x.shape[0], self.max_items - self.num_items)
            if take <= 0:
                return
            x = x[:take]
        if self.num_features is None:
            self.num_features = x.shape[1]
            self.raw_mean = np.zeros(self.num_features)
            self.raw_cov = np.zeros((self.num_features, self.num_features))
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x.astype(np.float32))
        if self.capture_mean_cov:
            self.raw_mean += x.sum(axis=0)
            self.raw_cov += x.T @ x

    def get_all(self) -> np.ndarray:
        return np.concatenate(self.all_features, axis=0)

    def get_mean_cov(self):
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items - np.outer(mean, mean)
        return mean, cov

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(self.__dict__, f)

    @classmethod
    def load(cls, path: str) -> "FeatureStats":
        with open(path, "rb") as f:
            state = pickle.load(f)
        obj = cls()
        obj.__dict__.update(state)
        return obj


def cache_path(cache_dir: str, tag: str, **kwargs) -> str:
    """Deterministic stat-cache file (ref metric_utils.py feature caching)."""
    key = repr(sorted(kwargs.items()))
    h = hashlib.md5((tag + key).encode()).hexdigest()[:16]
    return os.path.join(cache_dir, f"{tag}-{h}.pkl")


def stats_for_iterator(
    batches,                       # yields uint8/f32 images (N, C, H, W) in [0, 255]
    feature_fn: Callable,
    max_items: int,
    capture_all: bool = False,
    capture_mean_cov: bool = True,
) -> FeatureStats:
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    for imgs in batches:
        stats.append(np.asarray(feature_fn(imgs)))
        if stats.is_full():
            break
    return stats
