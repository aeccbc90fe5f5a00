// Host-side image data-plane kernels.
//
// The per-pixel work the input pipeline does for every image — uint8 ->
// float conversion fused with normalization, and padded placement into
// bucket buffers — is memory-bandwidth bound. numpy expresses it as a
// chain of whole-array temporaries (divide, subtract, divide: 3 extra
// round trips through memory); these kernels do one fused pass that the
// compiler auto-vectorizes.
//
// Built by detr_tensorflow_tpu/data/native.py via g++ -O3 and bound with
// ctypes (no pybind11 dependency). Pure C ABI.

#include <cstdint>
#include <cstring>

extern "C" {

// dst[y, x, c] = (src[y, x, c] / 255 - mean[c]) / std[c]
// (the "torch_resnet" method, reference detr_tf/data/processing.py:12-16)
void normalize_torch_u8(const uint8_t* src, float* dst, int64_t n_pixels,
                        const float* mean, const float* stddev) {
  // Precompute per-channel scale/shift: (v * (1/255) - m) / s
  //   = v * (1/(255*s)) - m/s
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * stddev[c]);
    shift[c] = mean[c] / stddev[c];
  }
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = src + i * 3;
    float* q = dst + i * 3;
    q[0] = p[0] * scale[0] - shift[0];
    q[1] = p[1] * scale[1] - shift[1];
    q[2] = p[2] * scale[2] - shift[2];
  }
}

// dst[y, x, c] = src[y, x, 2 - c] - mean[c]   (RGB->BGR + caffe mean,
// the "tf_resnet" method, reference processing.py:17-21)
void normalize_caffe_u8(const uint8_t* src, float* dst, int64_t n_pixels,
                        const float* mean) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = src + i * 3;
    float* q = dst + i * 3;
    q[0] = static_cast<float>(p[2]) - mean[0];
    q[1] = static_cast<float>(p[1]) - mean[1];
    q[2] = static_cast<float>(p[0]) - mean[2];
  }
}

// Fused normalize + placement into a zeroed (pad_h, pad_w, 3) bucket
// buffer. Returns nothing; caller provides dst pre-sized. Used by the
// original-size eval path (pad_image_to_bucket).
void normalize_torch_u8_into_bucket(const uint8_t* src, float* dst, int h,
                                    int w, int pad_h, int pad_w,
                                    const float* mean, const float* stddev) {
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = 1.0f / (255.0f * stddev[c]);
    shift[c] = mean[c] / stddev[c];
  }
  memset(dst, 0, sizeof(float) * static_cast<int64_t>(pad_h) * pad_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<int64_t>(y) * w * 3;
    float* out = dst + static_cast<int64_t>(y) * pad_w * 3;
    for (int x = 0; x < w * 3; x += 3) {
      out[x + 0] = row[x + 0] * scale[0] - shift[0];
      out[x + 1] = row[x + 1] * scale[1] - shift[1];
      out[x + 2] = row[x + 2] * scale[2] - shift[2];
    }
  }
}

}  // extern "C"
