"""DCM — nearest-class-mean (NCM) classification for long-tail detection.

Parity: /root/reference/mmdet/models/detectors/DCM.py and
DCM_bbox_head.py — an experimental two-phase classifier:
1. feature-dump phase: run the trained detector over the train set and
   collect the pre-classifier RoI feature of every positive RoI per class
   (DCM.py:82-109);
2. center build: per-class mean feature -> `dcm_center_fea` (the reference
   stores it as a .pt; here an .npz array);
3. test: classify RoIs by cosine similarity between their feature and the
   class centers (DCM.py:111-133), replacing the linear classifier scores.

The detector hook is `SharedFCBBoxHead(..., return_feature=True)`.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class CenterAccumulator:
    """Streaming per-class feature mean (the dump phase)."""

    def __init__(self, num_classes: int, feat_dim: int):
        self.sums = np.zeros((num_classes, feat_dim), np.float64)
        self.counts = np.zeros(num_classes, np.int64)

    def update(self, features: np.ndarray, labels: np.ndarray, valid: np.ndarray):
        """features (N, D); labels (N,) 1-based class (0 = bg, skipped)."""
        for f, l, v in zip(features, labels, valid):
            if v and l > 0:
                self.sums[l] += f
                self.counts[l] += 1

    def centers(self) -> np.ndarray:
        """(C, D) class-mean features; classes never seen stay zero."""
        out = np.zeros_like(self.sums, np.float32)
        seen = self.counts > 0
        out[seen] = (self.sums[seen] / self.counts[seen, None]).astype(np.float32)
        return out


def dcm_scores(
    features: jnp.ndarray,  # (N, D) roi features
    centers: jnp.ndarray,  # (C, D) class centers (row 0 = background, zero)
    bg_score: jnp.ndarray | None = None,  # (N,) optional bg prob from the head
) -> jnp.ndarray:
    """(N, C) cosine-similarity scores (DCM.py:111-133 parity).

    Normalized feature . normalized center; unseen classes (zero centers)
    yield 0. If `bg_score` given it fills column 0 (the reference keeps the
    head's background probability)."""
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    c = centers.astype(jnp.float32)
    cn = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
    sims = f @ cn.T  # (N, C)
    if bg_score is not None:
        sims = sims.at[:, 0].set(bg_score)
    return sims


def save_centers(path: str, centers: np.ndarray) -> None:
    np.savez(path, centers=centers)


def load_centers(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["centers"]
