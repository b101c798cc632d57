"""Host input-pipeline throughput: native C++ JPEG path vs cv2 reference.

Measures imgs/s/core for decode -> keep-ratio resize to (1333, 800) ->
normalize -> pad into the (800, 1344) serving canvas, over LVIS-like JPEG
sizes, and derives the host cores needed to sustain the measured chip
rates (BENCHMARKS round 3/4 serving numbers).
"""

import io
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np

from balancedgroupsoftmax_tpu import native
from balancedgroupsoftmax_tpu.data.pipeline import PipelineConfig, preprocess_image

assert native.available(), "native library must be built"

OUT_H, OUT_W = 800, 1344
MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)

# LVIS/COCO val image sizes cluster at 640x480/500x375/640x427
rng = np.random.RandomState(0)
jpegs = []
for i, (w, h) in enumerate([(640, 480), (500, 375), (640, 427), (612, 612)] * 8):
    base = rng.randint(0, 255, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    jpegs.append((bytes(buf.tobytes()), w, h))


def scaled(w, h):
    # keep-ratio resize to max (1333, 800) (Resize transform semantics)
    scale = min(1333 / max(w, h), 800 / min(w, h))
    return int(w * scale + 0.5), int(h * scale + 0.5)


# --- native path ------------------------------------------------------------
out = np.zeros((OUT_H, OUT_W, 3), np.float32)
for data, w, h in jpegs[:4]:  # warm
    nw, nh = scaled(w, h)
    assert native.preprocess_jpeg(data, nw, nh, False, MEAN, STD, out)

t0 = time.perf_counter()
REPS = 4
n = 0
for _ in range(REPS):
    for data, w, h in jpegs:
        nw, nh = scaled(w, h)
        out[:] = 0
        assert native.preprocess_jpeg(data, nw, nh, False, MEAN, STD, out)
        n += 1
dt = time.perf_counter() - t0
native_ips = n / dt
print(f"native C++ path: {dt / n * 1000:.1f} ms/img, {native_ips:.1f} imgs/s/core")

# --- cv2 reference path ------------------------------------------------------
cfgp = PipelineConfig()
t0 = time.perf_counter()
n = 0
for _ in range(REPS):
    for data, w, h in jpegs:
        img = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        nw, nh = scaled(w, h)
        r = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((OUT_H, OUT_W, 3), np.float32)
        canvas[:nh, :nw] = (r.astype(np.float32) - MEAN) / STD
        n += 1
dt = time.perf_counter() - t0
print(f"cv2 path:        {dt / n * 1000:.1f} ms/img, {n / dt:.1f} imgs/s/core")

for rate, tag in [(124.3, "gs_faster_r50 serving @32"), (87.9, "gs_mask_r50 device @16"), (71.9, "train step @16")]:
    print(f"cores to sustain {tag} ({rate} img/s/chip): {rate / native_ips:.1f}")
