"""Static-shape input pipeline: resize / flip / normalize / pad-to-bucket.

Parity: /root/reference/mmdet/datasets/pipelines/transforms.py — keep-ratio
Resize to (1333, 800) (:15,111), RandomFlip 0.5 (:171), Normalize with the
ImageNet mean/std in RGB (:276), Pad to size_divisor 32 (:223) — and the
aspect-ratio grouping of loader/sampler.py:39-76.

TPU redesign: instead of per-batch dynamic padding, every image lands in one
of two static buckets — landscape (800, 1344) or portrait (1344, 800) —
and batches are drawn from a single bucket (the static-shape equivalent of
GroupSampler's aspect flag). GT boxes/labels pad to a fixed capacity with a
validity mask. Repeat-factor sampling (RFS, loader/sampler.py:104-117,
t=0.001, r = max(1, sqrt(t/f))) is provided for the `transferred/*rfs*`
configs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)

LANDSCAPE_BUCKET = (800, 1344)
PORTRAIT_BUCKET = (1344, 800)


@dataclasses.dataclass
class PipelineConfig:
    scale: Tuple[int, int] = (1333, 800)  # (long, short)
    flip_prob: float = 0.5
    max_gt_boxes: int = 100
    mean: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_MEAN)
    std: np.ndarray = dataclasses.field(default_factory=lambda: IMAGENET_STD)
    # multi-scale training (HTC mstrain configs: short side sampled in
    # [400, 1400], transforms.py Resize img_scale ranges): short side drawn
    # uniformly per image; the padding bucket grows to fit the max scale.
    multiscale_range: Optional[Tuple[int, int]] = None

    def buckets(self) -> Tuple[Tuple[int, int], Tuple[int, int]]:
        """(landscape, portrait) static pad buckets for this scale setup."""
        long_side = max(self.scale)
        short = (
            max(self.scale[1], self.multiscale_range[1])
            if self.multiscale_range
            else min(self.scale)
        )
        pad = lambda v: -(-v // 32) * 32
        return (pad(short), pad(long_side)), (pad(long_side), pad(short))


def rescale_size(w: int, h: int, scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmcv.imrescale sizing: factor = min(long/max, short/min)."""
    long_side, short_side = max(scale), min(scale)
    f = min(long_side / max(w, h), short_side / min(w, h))
    return int(w * f + 0.5), int(h * f + 0.5), f


def preprocess_image(
    img: np.ndarray,  # (H, W, 3) uint8 RGB
    gt_bboxes: np.ndarray,  # (N, 4) xyxy at original scale
    gt_labels: np.ndarray,  # (N,)
    cfg: PipelineConfig,
    train: bool,
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, np.ndarray]:
    """One image -> static bucket tensors."""
    import cv2

    h0, w0 = img.shape[:2]
    scale = cfg.scale
    if train and cfg.multiscale_range is not None and rng is not None:
        short = int(rng.randint(cfg.multiscale_range[0], cfg.multiscale_range[1] + 1))
        scale = (max(cfg.scale), short)
    new_w, new_h, _ = rescale_size(w0, h0, scale)
    resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    w_scale = new_w / w0
    h_scale = new_h / h0
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    boxes = gt_bboxes * scale_factor if len(gt_bboxes) else gt_bboxes

    flipped = False
    if train and rng is not None and rng.rand() < cfg.flip_prob:
        resized = resized[:, ::-1]
        flipped = True
        if len(boxes):
            x1 = boxes[:, 0].copy()
            boxes[:, 0] = new_w - boxes[:, 2] - 1
            boxes[:, 2] = new_w - x1 - 1

    norm = (resized.astype(np.float32) - cfg.mean) / cfg.std

    land, port = cfg.buckets()
    bucket = land if new_w >= new_h else port
    bh, bw = bucket
    padded = np.zeros((bh, bw, 3), np.float32)
    padded[:new_h, :new_w] = norm

    g = cfg.max_gt_boxes
    out_boxes = np.zeros((g, 4), np.float32)
    out_labels = np.zeros((g,), np.int32)
    out_mask = np.zeros((g,), bool)
    n = min(len(boxes), g)
    if n:
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = gt_labels[:n]
        out_mask[:n] = True

    return dict(
        image=padded,
        gt_boxes=out_boxes,
        gt_labels=out_labels,
        gt_mask=out_mask,
        img_shape=np.array([new_h, new_w], np.float32),
        scale_factor=np.float32(w_scale),
        flipped=flipped,
        bucket=bucket,
    )


def preprocess_image_file(
    path: str,
    gt_bboxes: np.ndarray,
    gt_labels: np.ndarray,
    cfg: PipelineConfig,
    train: bool,
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, np.ndarray]:
    """`preprocess_image` from a file path, using the native pixel path.

    JPEG decode + fused bilinear resize / flip / normalize / pad run in one
    C++ call (native/src/bags_loader.cpp) with the GIL released; box
    geometry and GT padding stay in numpy (identical math to
    `preprocess_image`, including the rng draw order: multiscale short
    side first, then the flip coin). Non-JPEG inputs or a missing native
    library fall back to the cv2 path transparently.
    """
    from .. import native

    data = None
    dims = None
    if native.available():
        try:
            with open(path, "rb") as f:
                data = f.read()
            dims = native.jpeg_dims(data)
        except OSError:
            dims = None
    if dims is None:
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise ValueError(f"cannot decode image file: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return preprocess_image(img, gt_bboxes, gt_labels, cfg, train, rng)

    w0, h0 = dims
    scale = cfg.scale
    if train and cfg.multiscale_range is not None and rng is not None:
        short = int(rng.randint(cfg.multiscale_range[0], cfg.multiscale_range[1] + 1))
        scale = (max(cfg.scale), short)
    new_w, new_h, _ = rescale_size(w0, h0, scale)
    w_scale = new_w / w0
    h_scale = new_h / h0
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    boxes = gt_bboxes * scale_factor if len(gt_bboxes) else gt_bboxes

    flipped = bool(train and rng is not None and rng.rand() < cfg.flip_prob)
    if flipped and len(boxes):
        boxes = boxes.copy()
        x1 = boxes[:, 0].copy()
        boxes[:, 0] = new_w - boxes[:, 2] - 1
        boxes[:, 2] = new_w - x1 - 1

    land, port = cfg.buckets()
    bucket = land if new_w >= new_h else port
    bh, bw = bucket
    padded = np.zeros((bh, bw, 3), np.float32)
    if not native.preprocess_jpeg(
        data, new_w, new_h, flipped, cfg.mean, cfg.std, padded
    ):
        import cv2

        img = cv2.imread(path)
        if img is None:
            raise ValueError(f"cannot decode image file: {path}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        if flipped:
            resized = resized[:, ::-1]
        padded[:new_h, :new_w] = (resized.astype(np.float32) - cfg.mean) / cfg.std

    g = cfg.max_gt_boxes
    out_boxes = np.zeros((g, 4), np.float32)
    out_labels = np.zeros((g,), np.int32)
    out_mask = np.zeros((g,), bool)
    n = min(len(boxes), g)
    if n:
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = gt_labels[:n]
        out_mask[:n] = True

    return dict(
        image=padded,
        gt_boxes=out_boxes,
        gt_labels=out_labels,
        gt_mask=out_mask,
        img_shape=np.array([new_h, new_w], np.float32),
        scale_factor=np.float32(w_scale),
        flipped=flipped,
        bucket=bucket,
    )


def repeat_factors(
    labels_per_image: Sequence[np.ndarray],
    num_classes: int,
    t: float = 0.001,
) -> np.ndarray:
    """Per-image RFS repeat factor (loader/sampler.py:104-117).

    f_c = fraction of images containing class c; r_c = max(1, sqrt(t / f_c));
    r(I) = max over classes in I.
    """
    num_images = len(labels_per_image)
    img_count = np.zeros(num_classes + 1, np.float64)
    for labels in labels_per_image:
        for c in np.unique(labels):
            img_count[c] += 1
    f = img_count / max(num_images, 1)
    r_c = np.maximum(1.0, np.sqrt(t / np.maximum(f, 1e-12)))
    out = np.ones(num_images)
    for i, labels in enumerate(labels_per_image):
        if len(labels):
            out[i] = r_c[np.unique(labels)].max()
    return out


def expand_indices_by_repeat(
    repeat: np.ndarray, epoch_seed: int
) -> np.ndarray:
    """Stochastic rounding of repeat factors -> index list for one epoch."""
    rng = np.random.RandomState(epoch_seed)
    base = np.floor(repeat).astype(np.int64)
    frac = repeat - base
    extra = (rng.rand(len(repeat)) < frac).astype(np.int64)
    counts = base + extra
    return np.repeat(np.arange(len(repeat)), counts)


def sample_out_head_images(
    repeat: np.ndarray,
    labels_per_image: Sequence[np.ndarray],
    head_image_budget: int,
    epoch_seed: int,
) -> np.ndarray:
    """RFS with head-image subsampling.

    Parity: DistributedGroupSampler_addrepeat_sampleout
    (loader/sampler.py:459-633) — on top of repeat-factor expansion, images
    containing only head (repeat factor == 1) classes are subsampled to a
    fixed budget (the reference uses 6000 of ~17000). Returns the epoch's
    index list."""
    rng = np.random.RandomState(epoch_seed)
    is_head_only = np.array(
        [
            len(labels) > 0 and repeat[i] <= 1.0
            for i, labels in enumerate(labels_per_image)
        ]
    )
    head_idx = np.where(is_head_only)[0]
    keep_head = (
        rng.choice(head_idx, min(head_image_budget, len(head_idx)), replace=False)
        if len(head_idx)
        else head_idx
    )
    keep = np.zeros(len(repeat), bool)
    keep[keep_head] = True
    keep[~is_head_only] = True
    expanded = expand_indices_by_repeat(repeat, epoch_seed)
    return expanded[keep[expanded]]


class DetBatcher:
    """Deterministic epoch-seeded shuffling + aspect-bucket batching.

    Static-shape stand-in for DistributedGroupSampler
    (loader/sampler.py:238-320): each host takes a strided shard of the
    epoch permutation; batches mix only same-bucket images.
    """

    def __init__(
        self,
        bucket_flags: np.ndarray,  # (N,) 0 = landscape, 1 = portrait
        batch_size: int,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        repeat: Optional[np.ndarray] = None,
    ):
        self.bucket_flags = bucket_flags
        self.batch_size = batch_size
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.repeat = repeat

    def epoch_batches(self, epoch: int) -> List[np.ndarray]:
        rng = np.random.RandomState(self.seed + epoch)
        n = len(self.bucket_flags)
        if self.repeat is not None:
            indices = expand_indices_by_repeat(self.repeat, self.seed + epoch)
            rng.shuffle(indices)
        else:
            indices = rng.permutation(n)
        indices = indices[self.shard_id :: self.num_shards]

        batches = []
        for flag in (0, 1):
            idx = indices[self.bucket_flags[indices] == flag]
            full = len(idx) // self.batch_size * self.batch_size
            for s in range(0, full, self.batch_size):
                batches.append(idx[s : s + self.batch_size])
        order = rng.permutation(len(batches))
        return [batches[i] for i in order]


class EpisodicBatcher:
    """Few-shot episodic sampling (loader/sampler.py:173-236 parity).

    Each episode draws `n_ways` classes and `k_shots` images containing each
    class; batches are episodes. Used by the reference's episodic
    fine-tuning experiments."""

    def __init__(
        self,
        labels_per_image: Sequence[np.ndarray],
        n_ways: int = 5,
        k_shots: int = 2,
        seed: int = 0,
    ):
        self.n_ways = n_ways
        self.k_shots = k_shots
        self.seed = seed
        self.class_to_images: Dict[int, list] = {}
        for i, labels in enumerate(labels_per_image):
            for c in np.unique(labels):
                self.class_to_images.setdefault(int(c), []).append(i)
        # classes with at least k_shots images
        self.classes = [
            c for c, imgs in self.class_to_images.items() if len(imgs) >= k_shots
        ]

    def episodes(self, num_episodes: int, epoch: int = 0) -> List[np.ndarray]:
        rng = np.random.RandomState(self.seed + epoch)
        out = []
        for _ in range(num_episodes):
            ways = rng.choice(self.classes, min(self.n_ways, len(self.classes)),
                              replace=False)
            idx = []
            for c in ways:
                idx.extend(
                    rng.choice(self.class_to_images[c], self.k_shots, replace=False)
                )
            out.append(np.asarray(idx))
        return out


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return dict(
        images=np.stack([s["image"] for s in samples]),
        gt_boxes=np.stack([s["gt_boxes"] for s in samples]),
        gt_labels=np.stack([s["gt_labels"] for s in samples]),
        gt_mask=np.stack([s["gt_mask"] for s in samples]),
        img_shapes=np.stack([s["img_shape"] for s in samples]),
        scale_factors=np.stack([s["scale_factor"] for s in samples]),
    )
