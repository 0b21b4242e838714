// Native host-side image preprocessing for the TPU input pipeline.
//
// The reference performs JPEG decode + letterbox + normalize per sample in
// Python (OpenCV/PIL + tf.data maps — see AIServer/ai_api/ai_models/
// datasets/coco_dataset.py and views/object_detection.py:46-63).  This
// library is the framework's native equivalent: fused JPEG decode (libjpeg)
// → proportional bilinear letterbox into a fixed target frame → /255
// float32 NHWC, single pass, with a std::thread batch API so the host can
// keep a TPU fed without the Python interpreter in the loop.
//
// Exposed as a C ABI for ctypes (tmv_tpu/native/__init__.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer to tightly packed RGB8. Returns false on failure.
bool DecodeJpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  rgb->resize(size_t(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + size_t(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear sample from an RGB8 image (half-pixel centers, clamped).
inline void SampleBilinear(const uint8_t* src, int sw, int sh, float sx,
                           float sy, float* out) {
  sx = std::max(0.0f, std::min(sx, float(sw - 1)));
  sy = std::max(0.0f, std::min(sy, float(sh - 1)));
  int x0 = static_cast<int>(sx);
  int y0 = static_cast<int>(sy);
  int x1 = std::min(x0 + 1, sw - 1);
  int y1 = std::min(y0 + 1, sh - 1);
  float fx = sx - x0;
  float fy = sy - y0;
  for (int c = 0; c < 3; ++c) {
    float v00 = src[(size_t(y0) * sw + x0) * 3 + c];
    float v01 = src[(size_t(y0) * sw + x1) * 3 + c];
    float v10 = src[(size_t(y1) * sw + x0) * 3 + c];
    float v11 = src[(size_t(y1) * sw + x1) * 3 + c];
    out[c] = (v00 * (1 - fx) + v01 * fx) * (1 - fy) +
             (v10 * (1 - fx) + v11 * fx) * fy;
  }
}

// Letterbox the decoded image into (th, tw) float32 RGB /255, centered.
// Geometry matches utils/image_helper.py proportional_resize / the TF
// ResizeWithPad path: ratio = max(w/tw, h/th), floor sizes, centered pad.
void LetterboxNormalize(const uint8_t* src, int sw, int sh, int th, int tw,
                        float* out, int* meta) {
  float ratio = std::max(float(sw) / tw, float(sh) / th);
  int nw = static_cast<int>(sw / ratio);
  int nh = static_cast<int>(sh / ratio);
  int pad_x = (tw - nw) / 2;
  int pad_y = (th - nh) / 2;
  std::memset(out, 0, size_t(th) * tw * 3 * sizeof(float));
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < nh; ++y) {
    float sy = (y + 0.5f) * (float(sh) / nh) - 0.5f;
    float* row = out + (size_t(y + pad_y) * tw + pad_x) * 3;
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) * (float(sw) / nw) - 0.5f;
      float px[3];
      SampleBilinear(src, sw, sh, sx, sy, px);
      row[x * 3 + 0] = px[0] * inv255;
      row[x * 3 + 1] = px[1] * inv255;
      row[x * 3 + 2] = px[2] * inv255;
    }
  }
  if (meta) {
    meta[0] = pad_y;
    meta[1] = pad_x;
    meta[2] = sh;
    meta[3] = sw;
  }
}

}  // namespace

extern "C" {

// Decode one JPEG and letterbox into out (th*tw*3 f32). meta: int[4] =
// (pad_y, pad_x, src_h, src_w). Returns 0 on success.
int tmv_decode_letterbox(const uint8_t* jpeg, long jpeg_len, int th, int tw,
                         float* out, int* meta) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(jpeg, static_cast<size_t>(jpeg_len), &rgb, &w, &h)) {
    return 1;
  }
  LetterboxNormalize(rgb.data(), w, h, th, tw, out, meta);
  return 0;
}

// Batch API: n images, concatenated jpeg buffers with offsets[n+1].
// out: n*th*tw*3 f32; meta: n*4 int32; statuses: n int32.
// threads <= 0 → hardware concurrency.
void tmv_decode_letterbox_batch(const uint8_t* blob, const long* offsets,
                                int n, int th, int tw, float* out, int* meta,
                                int* statuses, int threads) {
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 1;
  }
  threads = std::min(threads, n);
  std::vector<std::thread> pool;
  std::atomic<int>* next = new std::atomic<int>(0);
  auto worker = [&]() {
    for (;;) {
      int i = next->fetch_add(1);
      if (i >= n) break;
      statuses[i] = tmv_decode_letterbox(
          blob + offsets[i], offsets[i + 1] - offsets[i], th, tw,
          out + size_t(i) * th * tw * 3, meta + size_t(i) * 4);
    }
  };
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  delete next;
}

// Raw RGB8 letterbox (no decode) — for non-JPEG sources.
void tmv_letterbox_rgb(const uint8_t* rgb, int sh, int sw, int th, int tw,
                       float* out, int* meta) {
  LetterboxNormalize(rgb, sw, sh, th, tw, out, meta);
}

// Header-only dimension probe. Returns 0 on success.
int tmv_jpeg_dims(const uint8_t* data, long len, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *width = cinfo.image_width;
  *height = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Serving hot path: ONE decode feeding both consumers — the full-res RGB8
// frame (response drawing, `views/object_detection.py:92-101` parity) and
// the letterboxed /255 float frame the predictor eats. out_rgb must hold
// width*height*3 bytes (probe with tmv_jpeg_dims); pass NULL to skip it.
int tmv_decode_letterbox_full(const uint8_t* jpeg, long jpeg_len, int th,
                              int tw, float* out, int* meta,
                              uint8_t* out_rgb) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(jpeg, static_cast<size_t>(jpeg_len), &rgb, &w, &h)) {
    return 1;
  }
  if (out_rgb) {
    std::memcpy(out_rgb, rgb.data(), rgb.size());
  }
  LetterboxNormalize(rgb.data(), w, h, th, tw, out, meta);
  return 0;
}

// JPEG-encode a tightly packed RGB8 image. Writes at most `cap` bytes
// into `out`; returns the encoded size, or -needed if `cap` is too small,
// or 0 on encode failure.
long tmv_encode_jpeg(const uint8_t* rgb, int h, int w, int quality,
                     uint8_t* out, long cap) {
  jpeg_compress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  unsigned char* buf = nullptr;
  unsigned long buf_len = 0;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    if (buf) free(buf);
    return 0;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buf_len);  // libjpeg-owned buffer
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(
        rgb + size_t(cinfo.next_scanline) * w * 3);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  long n = static_cast<long>(buf_len);
  if (n > cap) {
    free(buf);
    return -n;
  }
  std::memcpy(out, buf, buf_len);
  free(buf);
  return n;
}

}  // extern "C"
