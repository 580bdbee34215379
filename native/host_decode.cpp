// odtk_tpu native host pipeline: JPEG decode + resize + normalize.
//
// The TPU-native counterpart of the reference's DALI GPU loader
// (odtk/dali.py): on TPU the chips should spend zero cycles on JPEG
// bit-twiddling, so decode/resize/normalize runs on the host in native
// code. Python threads call in via ctypes (GIL released), giving real
// decode parallelism without worker processes.
//
// Exported C ABI:
//   odtk_decode_jpeg_resize_normalize(...)  -> decoded+resized+normalized
//   odtk_resize_normalize(...)              -> raw RGB u8 -> normalized f32
// Both write float32 HWC output with ImageNet mean/std normalization
// (same constants as odtk/data.py:25-26).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize RGB u8 -> RGB float, writing straight into a
// row-pitched destination with an optional fused per-channel affine
// (normalize): out = v * scale[c] + offset[c]. The x-axis source
// indices/weights are loop-invariant across rows, so they are
// precomputed once — the inner loop is pure multiply-add.
void resize_bilinear_fused(const uint8_t* src, int sh, int sw, float* dst,
                           int dh, int dw, int pitch_w, const float* scale,
                           const float* offset) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> xi0(dw), xi1(dw);
  std::vector<float> xw(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    xw[x] = fx - x0;
    xi1[x] = std::min(x0 + 1, sw - 1) * 3;
    xi0[x] = std::max(x0, 0) * 3;
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    float* out = dst + static_cast<size_t>(y) * pitch_w * 3;
    for (int x = 0; x < dw; ++x) {
      const float wx = xw[x];
      const uint8_t* p00 = row0 + xi0[x];
      const uint8_t* p01 = row0 + xi1[x];
      const uint8_t* p10 = row1 + xi0[x];
      const uint8_t* p11 = row1 + xi1[x];
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        out[x * 3 + c] = (top + (bot - top) * wy) * scale[c] + offset[c];
      }
    }
  }
}

// scale/offset pairs for the fused affine: identity (keep 0..255) or
// ImageNet normalization ((v/255 - mean) / std).
void affine_params(int normalize, float* scale, float* offset) {
  for (int c = 0; c < 3; ++c) {
    scale[c] = normalize ? 1.0f / (255.0f * kStd[c]) : 1.0f;
    offset[c] = normalize ? -kMean[c] / kStd[c] : 0.0f;
  }
}

// Bilinear resize RGB u8 -> RGB u8 at a row pitch. A bilinear blend of
// u8 values is convex, so the result stays in [0,255] — round, no
// clamp. This is the transfer-thin training feed: the device graph
// does color-jitter+normalize as one fused [3x3]+offset op on u8
// pixels, so the host ships 1/4 of the float bytes and skips the
// jitter matmul entirely (loader 'u8' emit mode).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw, int pitch_w) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> xi0(dw), xi1(dw);
  std::vector<float> xw(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    xw[x] = fx - x0;
    xi1[x] = std::min(x0 + 1, sw - 1) * 3;
    xi0[x] = std::max(x0, 0) * 3;
  }
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    uint8_t* out = dst + static_cast<size_t>(y) * pitch_w * 3;
    for (int x = 0; x < dw; ++x) {
      const float wx = xw[x];
      const uint8_t* p00 = row0 + xi0[x];
      const uint8_t* p01 = row0 + xi1[x];
      const uint8_t* p10 = row1 + xi0[x];
      const uint8_t* p11 = row1 + xi1[x];
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        out[x * 3 + c] =
            static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

}  // namespace

namespace {

// Shared JPEG decode front-end: bytes -> RGB u8 buffer (DCT-prescaled
// toward the target size) + prescaled dims + ORIGINAL dims (the resize
// targets th/tw are int(ratio * original), bit-identical to the Python
// resize_dims rule) + the aspect-preserving ratio.
// Returns 0 on success, 1 on decode error, 2 on truncated stream.
int decode_jpeg_rgb(const uint8_t* bytes, size_t len, int resize,
                    int max_size, std::vector<uint8_t>* rgb, int* dec_h,
                    int* dec_w, int* orig_h, int* orig_w, float* ratio) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(bytes),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // libjpeg DCT scaling: cheap pre-downscale by M/8 toward the target,
  // the precision-relevant part of the resize stays bilinear.
  int sw = cinfo.image_width, sh = cinfo.image_height;
  float r = static_cast<float>(resize) / std::min(sw, sh);
  if (r * std::max(sw, sh) > max_size) {
    r = static_cast<float>(max_size) / std::max(sw, sh);
  }
  int scale = 8;
  while (scale > 1 &&
         (sw * (scale - 1)) / 8 >= static_cast<int>(r * sw) * 2 &&
         (sh * (scale - 1)) / 8 >= static_cast<int>(r * sh) * 2) {
    --scale;
  }
  cinfo.scale_num = scale;
  cinfo.scale_denom = 8;

  jpeg_start_decompress(&cinfo);
  int dw = cinfo.output_width, dh = cinfo.output_height;
  rgb->resize(static_cast<size_t>(dw) * dh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline)
        * dw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  // Truncated streams don't error_exit: libjpeg fakes an EOI, pads the
  // tail gray, and only counts a corrupt-data WARNING. Treat that as a
  // failed decode (PIL's strictness) rather than silently training on
  // a half-gray image.
  long num_warnings = jerr.pub.num_warnings;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (num_warnings > 0) {
    return 2;
  }
  *dec_h = dh;
  *dec_w = dw;
  *orig_h = sh;
  *orig_w = sw;
  *ratio = r;
  return 0;
}

}  // namespace

extern "C" {

// Decode JPEG bytes, aspect-preserving resize (shorter side -> `resize`,
// capped so the longer side <= max_size; same rule as odtk/data.py:57-60),
// normalize, write float32 HWC into out (caller-allocated, padded
// out_h_pad x out_w_pad x 3; regions beyond the image are zeroed).
// Returns 0 on success. Outputs actual resized h/w and the scale ratio.
int odtk_decode_jpeg_resize_normalize(const uint8_t* bytes, size_t len,
                                      int resize, int max_size, float* out,
                                      int out_h_pad, int out_w_pad,
                                      int* out_h, int* out_w, float* ratio,
                                      int normalize) {
  std::vector<uint8_t> rgb;
  int dh, dw, sh, sw;
  float r;
  int rc = decode_jpeg_rgb(bytes, len, resize, max_size, &rgb, &dh, &dw,
                           &sh, &sw, &r);
  if (rc != 0) {
    return rc;
  }

  int th = static_cast<int>(r * sh), tw = static_cast<int>(r * sw);
  th = std::max(1, std::min(th, out_h_pad));
  tw = std::max(1, std::min(tw, out_w_pad));

  // resize+normalize straight into the pitched output; zero only the
  // padding margins (right strip of each image row + full bottom rows)
  float aff_s[3], aff_o[3];
  affine_params(normalize, aff_s, aff_o);
  resize_bilinear_fused(rgb.data(), dh, dw, out, th, tw, out_w_pad, aff_s,
                        aff_o);
  if (tw < out_w_pad) {
    for (int y = 0; y < th; ++y) {
      std::memset(out + (static_cast<size_t>(y) * out_w_pad + tw) * 3, 0,
                  static_cast<size_t>(out_w_pad - tw) * 3 * sizeof(float));
    }
  }
  if (th < out_h_pad) {
    std::memset(out + static_cast<size_t>(th) * out_w_pad * 3, 0,
                static_cast<size_t>(out_h_pad - th) * out_w_pad * 3 *
                    sizeof(float));
  }
  *out_h = th;
  *out_w = tw;
  *ratio = r;
  return 0;
}

// u8 twin of the above: decode + aspect-preserving resize, u8 HWC
// output at the padded pitch, margins zeroed, NO color math — the
// jitter+normalize affine runs on-device (loader 'u8' emit mode ships
// 1/4 of the float bytes over the host->device link).
int odtk_decode_jpeg_resize_u8(const uint8_t* bytes, size_t len,
                               int resize, int max_size, uint8_t* out,
                               int out_h_pad, int out_w_pad, int* out_h,
                               int* out_w, float* ratio) {
  std::vector<uint8_t> rgb;
  int dh, dw, sh, sw;
  float r;
  int rc = decode_jpeg_rgb(bytes, len, resize, max_size, &rgb, &dh, &dw,
                           &sh, &sw, &r);
  if (rc != 0) {
    return rc;
  }

  int th = static_cast<int>(r * sh), tw = static_cast<int>(r * sw);
  th = std::max(1, std::min(th, out_h_pad));
  tw = std::max(1, std::min(tw, out_w_pad));

  resize_bilinear_u8(rgb.data(), dh, dw, out, th, tw, out_w_pad);
  if (tw < out_w_pad) {
    for (int y = 0; y < th; ++y) {
      std::memset(out + (static_cast<size_t>(y) * out_w_pad + tw) * 3, 0,
                  static_cast<size_t>(out_w_pad - tw) * 3);
    }
  }
  if (th < out_h_pad) {
    std::memset(out + static_cast<size_t>(th) * out_w_pad * 3, 0,
                static_cast<size_t>(out_h_pad - th) * out_w_pad * 3);
  }
  *out_h = th;
  *out_w = tw;
  *ratio = r;
  return 0;
}

// u8 resize for non-JPEG sources on the u8 emit path.
int odtk_resize_u8(const uint8_t* rgb, int h, int w, uint8_t* out,
                   int out_h, int out_w) {
  resize_bilinear_u8(rgb, h, w, out, out_h, out_w, out_w);
  return 0;
}

// RGB u8 [h, w, 3] -> YUV420 planes: y_out [h, w], c_out
// [ceil(h/2), ceil(w/2), 2] (Cb, Cr interleaved). JFIF/BT.601
// full-range, chroma = mean of each 2x2 block (edge blocks replicate).
// The train loader's yuv420 emission runs this instead of a numpy
// matmul+reduce chain (~10x per-image cost on a 1-core host).
int odtk_rgb_to_yuv420(const uint8_t* rgb, int h, int w, uint8_t* y_out,
                       uint8_t* c_out) {
  const int ch = (h + 1) / 2, cw = (w + 1) / 2;
  for (int by = 0; by < ch; ++by) {
    const int y0 = 2 * by, y1 = (2 * by + 1 < h) ? 2 * by + 1 : y0;
    uint8_t* crow = c_out + static_cast<size_t>(by) * cw * 2;
    for (int bx = 0; bx < cw; ++bx) {
      const int x0 = 2 * bx, x1 = (2 * bx + 1 < w) ? 2 * bx + 1 : x0;
      float cb = 0.0f, cr = 0.0f;
      const int ys[2] = {y0, y1}, xs[2] = {x0, x1};
      for (int i = 0; i < 2; ++i) {
        for (int j = 0; j < 2; ++j) {
          const uint8_t* p =
              rgb + (static_cast<size_t>(ys[i]) * w + xs[j]) * 3;
          const float r = p[0], g = p[1], b = p[2];
          const float yy = 0.299f * r + 0.587f * g + 0.114f * b;
          // write Y for the source pixel only once (replicated edge
          // coordinates revisit the same pixel)
          if ((i == 0 || y1 != y0) && (j == 0 || x1 != x0)) {
            y_out[static_cast<size_t>(ys[i]) * w + xs[j]] =
                static_cast<uint8_t>(yy + 0.5f);
          }
          cb += -0.168736f * r - 0.331264f * g + 0.5f * b;
          cr += 0.5f * r - 0.418688f * g - 0.081312f * b;
        }
      }
      float cbv = cb * 0.25f + 128.5f;
      float crv = cr * 0.25f + 128.5f;
      crow[bx * 2] = static_cast<uint8_t>(
          cbv < 0 ? 0 : (cbv > 255 ? 255 : cbv));
      crow[bx * 2 + 1] = static_cast<uint8_t>(
          crv < 0 ? 0 : (crv > 255 ? 255 : crv));
    }
  }
  return 0;
}

// Raw RGB u8 [h, w, 3] -> resized+normalized float32 into out
// (out_h x out_w x 3, exact size). Used for non-JPEG sources decoded
// by the Python fallback.
int odtk_resize_normalize(const uint8_t* rgb, int h, int w, float* out,
                          int out_h, int out_w, int normalize) {
  float scale[3], offset[3];
  affine_params(normalize, scale, offset);
  resize_bilinear_fused(rgb, h, w, out, out_h, out_w, out_w, scale, offset);
  return 0;
}

}  // extern "C"
