// Native evaluation kernels for balancedgroupsoftmax_tpu.
//
// The LVIS evaluator's hot path is host-side: per-(image, category) IoU
// matrices and the greedy detection<->GT matcher across 10 IoU thresholds
// (the reference runs this in pure Python inside lvis-api/lvis/eval.py —
// its slowest component; SURVEY.md §3.2 "CPU hot loop"). These kernels
// implement that inner loop in C++, exposed through plain C symbols for
// ctypes binding (no pybind11 in the image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// IoU between xywh boxes; iscrowd gts use intersection-over-detection.
// dt: (nd, 4), gt: (ng, 4), out: (nd, ng) row-major.
void box_iou_xywh(const double* dt, int64_t nd, const double* gt, int64_t ng,
                  const uint8_t* iscrowd, double* out) {
  for (int64_t i = 0; i < nd; ++i) {
    const double dx1 = dt[i * 4 + 0], dy1 = dt[i * 4 + 1];
    const double dw = dt[i * 4 + 2], dh = dt[i * 4 + 3];
    const double dx2 = dx1 + dw, dy2 = dy1 + dh;
    const double darea = dw * dh;
    for (int64_t j = 0; j < ng; ++j) {
      const double gx1 = gt[j * 4 + 0], gy1 = gt[j * 4 + 1];
      const double gw = gt[j * 4 + 2], gh = gt[j * 4 + 3];
      const double gx2 = gx1 + gw, gy2 = gy1 + gh;
      const double iw = std::max(0.0, std::min(dx2, gx2) - std::max(dx1, gx1));
      const double ih = std::max(0.0, std::min(dy2, gy2) - std::max(dy1, gy1));
      const double inter = iw * ih;
      const double uni =
          (iscrowd && iscrowd[j]) ? darea : darea + gw * gh - inter;
      out[i * ng + j] = uni > 1e-12 ? inter / uni : 0.0;
    }
  }
}

// Greedy matcher for one (image, category) pair across nt IoU thresholds.
// Reproduces lvis-api eval.py:234-265 exactly:
//   - dts pre-sorted by descending score, gts sorted ignore-last;
//   - each dt takes the best still-free gt with iou >= thr, stopping at
//     ignore gts once a real match exists.
// ious: (nd, ng); gt_ig: (ng,); outputs (nt, nd)/(nt, ng) row-major:
//   dt_m / gt_m get the 1-based index of the matched counterpart (0 = none),
//   dt_ig_out marks dts matched to ignored gts.
void greedy_match(const double* ious, int64_t nd, int64_t ng,
                  const double* iou_thrs, int64_t nt, const int8_t* gt_ig,
                  double* dt_m, double* gt_m, int8_t* dt_ig_out) {
  std::memset(dt_m, 0, sizeof(double) * nt * nd);
  std::memset(gt_m, 0, sizeof(double) * nt * ng);
  std::memset(dt_ig_out, 0, sizeof(int8_t) * nt * nd);
  for (int64_t t = 0; t < nt; ++t) {
    for (int64_t d = 0; d < nd; ++d) {
      double best = std::min(iou_thrs[t], 1.0 - 1e-10);
      int64_t m = -1;
      for (int64_t g = 0; g < ng; ++g) {
        if (gt_m[t * ng + g] > 0) continue;
        if (m > -1 && gt_ig[m] == 0 && gt_ig[g] == 1) break;
        const double v = ious[d * ng + g];
        if (v < best) continue;
        best = v;
        m = g;
      }
      if (m == -1) continue;
      dt_ig_out[t * nd + d] = gt_ig[m];
      dt_m[t * nd + d] = static_cast<double>(m + 1);
      gt_m[t * ng + m] = static_cast<double>(d + 1);
    }
  }
}

// Column-major RLE decode: counts -> (h, w) uint8 mask buffer (F order).
void rle_decode(const int64_t* counts, int64_t ncounts, int64_t h, int64_t w,
                uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h) * w);
  int64_t pos = 0;
  uint8_t val = 0;
  const int64_t total = h * w;
  for (int64_t i = 0; i < ncounts && pos < total; ++i) {
    int64_t c = counts[i];
    if (c > total - pos) c = total - pos;
    if (val) std::memset(out + pos, 1, static_cast<size_t>(c));
    pos += c;
    val ^= 1;
  }
}

// Mask IoU over pre-decoded column-major bitmasks.
// masks_a: (na, h*w), masks_b: (nb, h*w), out (na, nb).
void mask_iou(const uint8_t* a, int64_t na, const uint8_t* b, int64_t nb,
              int64_t npix, const uint8_t* iscrowd, double* out) {
  for (int64_t i = 0; i < na; ++i) {
    const uint8_t* ai = a + i * npix;
    int64_t sa = 0;
    for (int64_t p = 0; p < npix; ++p) sa += ai[p];
    for (int64_t j = 0; j < nb; ++j) {
      const uint8_t* bj = b + j * npix;
      int64_t sb = 0, inter = 0;
      for (int64_t p = 0; p < npix; ++p) {
        sb += bj[p];
        inter += ai[p] & bj[p];
      }
      const double uni =
          (iscrowd && iscrowd[j]) ? double(sa) : double(sa + sb - inter);
      out[i * nb + j] = uni > 0 ? double(inter) / uni : 0.0;
    }
  }
}

}  // extern "C"
