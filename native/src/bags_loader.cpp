// Native input-pipeline kernels for balancedgroupsoftmax_tpu.
//
// The reference's data layer does JPEG decode + keep-ratio resize + flip +
// normalize + pad per image in Python workers (mmdet datasets/pipelines/
// loading.py + transforms.py via cv2). Here the whole per-image pixel path
// is one C++ call — decode (libjpeg), fused bilinear resize / horizontal
// flip / (x-mean)/std normalize, written directly into the caller's padded
// static-bucket buffer — exposed through plain C symbols for ctypes (no
// pybind11 in the image). ctypes releases the GIL during the call, so a
// Python thread pool scales these across cores.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links -ljpeg)

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

void emit_message(j_common_ptr, int) {}  // silence warnings

// Decode a JPEG byte stream to tightly-packed RGB8. Returns false on any
// decode error (caller falls back to the Python path).
bool decode_rgb(const uint8_t* data, int64_t len, std::vector<uint8_t>* rgb,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // converts grayscale/YCbCr; CMYK errors
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  if (cinfo.output_components != 3 || *w <= 0 || *h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  const int stride = *w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

// Peek JPEG dimensions without a full decode. Returns 0 on success.
int bags_jpeg_dims(const uint8_t* data, int64_t len, int32_t* w, int32_t* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  jerr.pub.emit_message = emit_message;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *w = static_cast<int32_t>(cinfo.image_width);
  *h = static_cast<int32_t>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode + bilinear resize to (new_w, new_h) (cv2 INTER_LINEAR half-pixel
// convention) + optional horizontal flip + (x - mean) / std per RGB channel,
// written into the top-left of the caller's (out_h, out_w, 3) f32 buffer.
// The padding region is left untouched (caller pre-zeros the bucket).
// Returns 0 on success, nonzero on decode failure.
int bags_preprocess_jpeg(const uint8_t* data, int64_t len, int32_t new_w,
                         int32_t new_h, int32_t flip, const float* mean,
                         const float* std_, float* out, int32_t out_h,
                         int32_t out_w) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_rgb(data, len, &rgb, &w, &h)) return 1;
  if (new_w <= 0 || new_h <= 0 || new_w > out_w || new_h > out_h) return 2;

  const float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  const float sx = static_cast<float>(w) / new_w;
  const float sy = static_cast<float>(h) / new_h;

  // precompute per-column source indices/weights (shared across rows)
  std::vector<int> x0s(new_w), x1s(new_w);
  std::vector<float> wxs(new_w);
  for (int x = 0; x < new_w; ++x) {
    const int xd = flip ? (new_w - 1 - x) : x;
    float fx = (xd + 0.5f) * sx - 0.5f;
    fx = std::min(std::max(fx, 0.0f), static_cast<float>(w - 1));
    const int x0 = static_cast<int>(fx);
    x0s[x] = x0;
    x1s[x] = std::min(x0 + 1, w - 1);
    wxs[x] = fx - x0;
  }

  for (int y = 0; y < new_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(h - 1));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float wy = fy - y0;
    const uint8_t* r0 = rgb.data() + static_cast<size_t>(y0) * w * 3;
    const uint8_t* r1 = rgb.data() + static_cast<size_t>(y1) * w * 3;
    float* orow = out + (static_cast<size_t>(y) * out_w) * 3;
    for (int x = 0; x < new_w; ++x) {
      const int x0 = x0s[x] * 3, x1 = x1s[x] * 3;
      const float wx = wxs[x];
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * r0[x0 + c] + w01 * r0[x1 + c] +
                        w10 * r1[x0 + c] + w11 * r1[x1 + c];
        orow[x * 3 + c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
  return 0;
}

}  // extern "C"
