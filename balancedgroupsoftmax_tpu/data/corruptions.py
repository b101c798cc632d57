"""Image corruption benchmark transforms (robustness evaluation).

Parity: /root/reference/tools/test_robustness.py — evaluates detectors under
the 15 ImageNet-C corruption types x 5 severities (test_robustness.py:
308-337, backed by the `imagecorruptions` package). That package is not in
this image, so the corruptions are re-implemented here in numpy/cv2 from
the published ImageNet-C recipes. `frost` requires photographic frost
assets and is approximated procedurally (documented deviation).

All functions take/return uint8 RGB (H, W, 3), severity in 1..5.
"""

from __future__ import annotations

import numpy as np

CORRUPTIONS = (
    "gaussian_noise",
    "shot_noise",
    "impulse_noise",
    "defocus_blur",
    "glass_blur",
    "motion_blur",
    "zoom_blur",
    "snow",
    "frost",
    "fog",
    "brightness",
    "contrast",
    "elastic_transform",
    "pixelate",
    "jpeg_compression",
)


def _f(img):
    return img.astype(np.float32) / 255.0


def _u8(x):
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def gaussian_noise(img, severity=1, rng=None):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    rng = rng or np.random.RandomState(0)
    return _u8(_f(img) + rng.normal(size=img.shape, scale=c))


def shot_noise(img, severity=1, rng=None):
    c = [60, 25, 12, 5, 3][severity - 1]
    rng = rng or np.random.RandomState(0)
    return _u8(rng.poisson(_f(img) * c) / float(c))


def impulse_noise(img, severity=1, rng=None):
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _f(img).copy()
    m = rng.rand(*img.shape[:2])
    x[m < c / 2] = 0.0
    x[m > 1 - c / 2] = 1.0
    return _u8(x)


def _disk(radius):
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    d = (x**2 + y**2) <= radius**2
    k = d.astype(np.float32)
    return k / k.sum()


def defocus_blur(img, severity=1, rng=None):
    import cv2

    c = [3, 4, 6, 8, 10][severity - 1]
    k = _disk(c)
    ch = [cv2.filter2D(_f(img)[..., i], -1, k) for i in range(3)]
    return _u8(np.stack(ch, -1))


def glass_blur(img, severity=1, rng=None):
    import cv2

    sigma, max_delta, iters = [(0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2), (1.5, 4, 2)][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = (cv2.GaussianBlur(_f(img), (0, 0), sigma) * 255).astype(np.uint8)
    h, w = x.shape[:2]
    for _ in range(iters):
        dy = rng.randint(-max_delta, max_delta + 1, (h - 2 * max_delta, w - 2 * max_delta))
        dx = rng.randint(-max_delta, max_delta + 1, (h - 2 * max_delta, w - 2 * max_delta))
        ys = np.arange(max_delta, h - max_delta)[:, None] + dy
        xs = np.arange(max_delta, w - max_delta)[None, :] + dx
        x[max_delta : h - max_delta, max_delta : w - max_delta], x[ys, xs] = (
            x[ys, xs],
            x[max_delta : h - max_delta, max_delta : w - max_delta],
        )
    return _u8(cv2.GaussianBlur(_f(x), (0, 0), sigma))


def motion_blur(img, severity=1, rng=None):
    import cv2

    size, angle = [(10, 10), (15, 5), (15, -5), (15, -15), (20, -20)][severity - 1]
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1)
    k = cv2.warpAffine(k, m, (size, size))
    k /= k.sum()
    return _u8(np.stack([cv2.filter2D(_f(img)[..., i], -1, k) for i in range(3)], -1))


def zoom_blur(img, severity=1, rng=None):
    import cv2

    c = [1.11, 1.16, 1.21, 1.26, 1.31][severity - 1]
    h, w = img.shape[:2]
    x = _f(img)
    acc = np.zeros_like(x)
    zooms = np.arange(1.0, c, 0.01)
    for z in zooms:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        zimg = cv2.resize(x, (zw, zh))
        top = (zh - h) // 2
        left = (zw - w) // 2
        acc += zimg[top : top + h, left : left + w]
    return _u8((x + acc) / (len(zooms) + 1))


def snow(img, severity=1, rng=None):
    import cv2

    c = [(0.1, 0.3, 3, 0.5), (0.2, 0.3, 2, 0.5), (0.55, 0.3, 4, 0.9),
         (0.55, 0.3, 4.5, 0.85), (0.55, 0.3, 2.5, 0.85)][severity - 1]
    rng = rng or np.random.RandomState(0)
    x = _f(img)
    layer = rng.normal(size=x.shape[:2], loc=c[0], scale=c[1])
    layer = np.clip(layer, 0, 1)
    layer[layer < 0.5] = 0
    layer = cv2.GaussianBlur(layer, (0, 0), c[2])
    out = np.maximum(x, x * (1 - c[3] * layer[..., None]) + c[3] * layer[..., None])
    return _u8(out)


def frost(img, severity=1, rng=None):
    """Procedural approximation (the reference uses photographic frost
    assets not shipped here): low-frequency noise overlay."""
    import cv2

    c = [(1, 0.2), (0.9, 0.3), (0.85, 0.35), (0.8, 0.45), (0.75, 0.5)][severity - 1]
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    noise = rng.rand(h // 8 + 1, w // 8 + 1).astype(np.float32)
    noise = cv2.resize(noise, (w, h))
    noise = cv2.GaussianBlur(noise, (0, 0), 4)
    frost_layer = (noise > 0.55).astype(np.float32) * noise
    return _u8(_f(img) * c[0] + c[1] * frost_layer[..., None])


def fog(img, severity=1, rng=None):
    import cv2

    c = [(1.5, 2), (2.0, 2), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][severity - 1]
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    fog_layer = rng.rand(h // 16 + 1, w // 16 + 1).astype(np.float32)
    fog_layer = cv2.GaussianBlur(cv2.resize(fog_layer, (w, h)), (0, 0), 8)
    x = _f(img)
    max_val = x.max()
    x = x + c[0] * fog_layer[..., None] ** c[1]
    return _u8(x * max_val / max(x.max(), 1e-6))


def brightness(img, severity=1, rng=None):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return _u8(_f(img) + c)


def contrast(img, severity=1, rng=None):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _f(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return _u8((x - mean) * c + mean)


def elastic_transform(img, severity=1, rng=None):
    import cv2

    c = [(2, 0.7), (2, 0.08), (0.05, 0.01), (0.07, 0.01), (0.12, 0.01)][severity - 1]
    rng = rng or np.random.RandomState(0)
    h, w = img.shape[:2]
    shape_size = min(h, w)
    alpha = c[0] * shape_size
    sigma = max(c[1] * shape_size, 1.0)
    dx = cv2.GaussianBlur((rng.rand(h, w) * 2 - 1).astype(np.float32), (0, 0), sigma) * alpha
    dy = cv2.GaussianBlur((rng.rand(h, w) * 2 - 1).astype(np.float32), (0, 0), sigma) * alpha
    xg, yg = np.meshgrid(np.arange(w), np.arange(h))
    mapx = (xg + dx).astype(np.float32)
    mapy = (yg + dy).astype(np.float32)
    return cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)


def pixelate(img, severity=1, rng=None):
    import cv2

    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)), interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity=1, rng=None):
    import cv2

    c = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), c])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]


_FUNCS = {name: globals()[name] for name in CORRUPTIONS}


def corrupt(img: np.ndarray, corruption: str, severity: int = 1, seed: int = 0):
    """Apply a named corruption (severity 0 = identity)."""
    if severity == 0:
        return img
    rng = np.random.RandomState(seed)
    return _FUNCS[corruption](img, severity, rng=rng)
