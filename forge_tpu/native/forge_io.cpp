// forge_io: native data-loading runtime for forge_tpu.
//
// The reference's input pipeline is Python/PIL inside torch DataLoader worker
// processes (dataset/kubric.py:410-445). forge_tpu's training hosts are
// single-core TPU VMs in this environment, so image decode + high-quality
// resize is the host-side bottleneck; this library moves it to C++:
//
//   - PNG (8-bit RGB/RGBA, 16-bit grayscale) decode via libpng
//   - JPEG decode via libjpeg
//   - white-background RGBA composite + alpha>0 mask extraction
//     (matching dataset/kubric.py:415-424 semantics)
//   - separable Lanczos-3 resize for RGB (PIL 'ANTIALIAS' equivalent) and
//     nearest-neighbor for masks
//   - a pthread worker pool that decodes a batch of files concurrently into
//     caller-provided float32 buffers (zero Python-side copies)
//
// C ABI only; bound from Python with ctypes (forge_tpu/data/native_io.py).
// Depth TIFFs remain on the Python path (no libtiff in this image).

#include <png.h>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // interleaved
};

// ---------------------------------------------------------------- PNG decode

bool decode_png(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->w = (int)w;
  out->h = (int)h;
  out->channels = channels;
  out->data.resize((size_t)w * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; y++)
    rows[y] = out->data.data() + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// --------------------------------------------------------------- JPEG decode

bool decode_jpeg(const char* path, Image* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_image(const char* path, Image* out) {
  size_t n = strlen(path);
  if (n > 4 && (strcmp(path + n - 4, ".jpg") == 0 ||
                strcmp(path + n - 5, ".jpeg") == 0))
    return decode_jpeg(path, out);
  return decode_png(path, out);
}

// ------------------------------------------------------------ Lanczos resize

inline float lanczos3(float x) {
  x = std::fabs(x);
  if (x < 1e-8f) return 1.0f;
  if (x >= 3.0f) return 0.0f;
  float pix = (float)M_PI * x;
  return 3.0f * std::sin(pix) * std::sin(pix / 3.0f) / (pix * pix);
}

// Precomputed kernel for one output axis (PIL-style support scaling).
struct ResampleKernel {
  int ksize;
  std::vector<int> bounds_lo;           // per output index
  std::vector<std::vector<float>> wts;  // per output index
};

ResampleKernel build_kernel(int in_size, int out_size) {
  ResampleKernel k;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  k.ksize = (int)std::ceil(support) * 2 + 1;
  k.bounds_lo.resize(out_size);
  k.wts.resize(out_size);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int lo = (int)std::max(center - support + 0.5, 0.0);
    int hi = (int)std::min(center + support + 0.5, (double)in_size);
    k.bounds_lo[xx] = lo;
    std::vector<float>& w = k.wts[xx];
    w.resize(hi - lo);
    double total = 0.0;
    for (int i = 0; i < hi - lo; i++) {
      double ww = lanczos3((float)((i + lo - center + 0.5) / filterscale));
      w[i] = (float)ww;
      total += ww;
    }
    if (total != 0.0)
      for (auto& ww : w) ww = (float)(ww / total);
  }
  return k;
}

// Per-(in,out)-size kernel cache: a training epoch resizes thousands of
// same-shaped frames, and rebuilding the Lanczos taps (sin/divisions per
// tap) per image was ~10% of the native path's time. Tiny map, mutex-
// guarded (the batch worker pool calls concurrently).
const ResampleKernel& cached_kernel(int in_size, int out_size) {
  static std::mutex mu;
  // deque: references to existing entries stay valid while the cache grows
  // (worker threads hold them across the resize loops)
  static std::deque<std::pair<uint64_t, ResampleKernel>> cache;
  uint64_t key = ((uint64_t)in_size << 32) | (uint32_t)out_size;
  std::lock_guard<std::mutex> lock(mu);
  for (auto& e : cache)
    if (e.first == key) return e.second;
  cache.emplace_back(key, build_kernel(in_size, out_size));
  return cache.back().second;
}

// float planar resize along both axes (separable)
void resize_lanczos(const float* in, int in_h, int in_w, int ch, float* out,
                    int out_h, int out_w) {
  const ResampleKernel& kx = cached_kernel(in_w, out_w);
  const ResampleKernel& ky = cached_kernel(in_h, out_h);
  // horizontal pass: [in_h, out_w, ch]
  std::vector<float> tmp((size_t)in_h * out_w * ch);
  for (int y = 0; y < in_h; y++) {
    for (int x = 0; x < out_w; x++) {
      const auto& w = kx.wts[x];
      int lo = kx.bounds_lo[x];
      for (int c = 0; c < ch; c++) {
        float acc = 0.f;
        for (size_t i = 0; i < w.size(); i++)
          acc += w[i] * in[((size_t)y * in_w + lo + i) * ch + c];
        tmp[((size_t)y * out_w + x) * ch + c] = acc;
      }
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; y++) {
    const auto& w = ky.wts[y];
    int lo = ky.bounds_lo[y];
    for (int x = 0; x < out_w; x++) {
      for (int c = 0; c < ch; c++) {
        float acc = 0.f;
        for (size_t i = 0; i < w.size(); i++)
          acc += w[i] * tmp[((size_t)(lo + i) * out_w + x) * ch + c];
        out[((size_t)y * out_w + x) * ch + c] = acc;
      }
    }
  }
}

void resize_nearest(const float* in, int in_h, int in_w, float* out, int out_h,
                    int out_w) {
  // PIL NEAREST: src = floor(dst * in/out  + ... ) — uses affine center rule
  for (int y = 0; y < out_h; y++) {
    int sy = std::min((int)((y + 0.5) * in_h / out_h), in_h - 1);
    for (int x = 0; x < out_w; x++) {
      int sx = std::min((int)((x + 0.5) * in_w / out_w), in_w - 1);
      out[(size_t)y * out_w + x] = in[(size_t)sy * in_w + sx];
    }
  }
}

// ------------------------------------------------- frame load (full pipeline)

// Loads one RGBA frame: composite, mask, resize; writes float32
// rgb [out_size, out_size, 3] and mask [out_size, out_size, 1].
bool load_frame_impl(const char* path, int out_size, int mask_images,
                     float* rgb_out, float* mask_out) {
  Image img;
  if (!decode_image(path, &img)) return false;
  int w = img.w, h = img.h;
  std::vector<float> rgbf((size_t)w * h * 3);
  std::vector<float> maskf((size_t)w * h);

  for (int i = 0; i < w * h; i++) {
    float a = 1.0f;
    float r, g, b;
    if (img.channels == 4) {
      uint8_t au = img.data[(size_t)i * 4 + 3];
      a = au / 255.0f;
      r = img.data[(size_t)i * 4 + 0] / 255.0f;
      g = img.data[(size_t)i * 4 + 1] / 255.0f;
      b = img.data[(size_t)i * 4 + 2] / 255.0f;
      maskf[i] = au > 0 ? 1.0f : 0.0f;
      if (!mask_images) {
        // white-background composite (reference: dataset/kubric.py:417-421)
        r = r * a + (1.0f - a);
        g = g * a + (1.0f - a);
        b = b * a + (1.0f - a);
      }
    } else {
      int ch = img.channels;
      r = img.data[(size_t)i * ch + 0] / 255.0f;
      g = img.data[(size_t)i * ch + (ch > 1 ? 1 : 0)] / 255.0f;
      b = img.data[(size_t)i * ch + (ch > 2 ? 2 : 0)] / 255.0f;
      maskf[i] = (r > 0 || g > 0 || b > 0) ? 1.0f : 0.0f;
    }
    rgbf[(size_t)i * 3 + 0] = r;
    rgbf[(size_t)i * 3 + 1] = g;
    rgbf[(size_t)i * 3 + 2] = b;
  }

  resize_lanczos(rgbf.data(), h, w, 3, rgb_out, out_size, out_size);
  resize_nearest(maskf.data(), h, w, mask_out, out_size, out_size);
  // clamp ringing like PIL's uint8 round-trip clamps
  for (int i = 0; i < out_size * out_size * 3; i++)
    rgb_out[i] = std::min(1.0f, std::max(0.0f, rgb_out[i]));
  return true;
}

}  // namespace

extern "C" {

// Single frame. Returns 0 on success.
int forge_io_load_frame(const char* path, int out_size, int mask_images,
                        float* rgb_out, float* mask_out) {
  return load_frame_impl(path, out_size, mask_images, rgb_out, mask_out) ? 0 : 1;
}

// Batch of frames decoded concurrently with `n_threads` workers.
// paths: array of n C strings. rgb_out: [n, s, s, 3]; mask_out: [n, s, s, 1].
// Returns number of failures.
int forge_io_load_batch(const char** paths, int n, int out_size,
                        int mask_images, int n_threads, float* rgb_out,
                        float* mask_out) {
  std::atomic<int> next(0), failures(0);
  int nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> workers;
  size_t rgb_stride = (size_t)out_size * out_size * 3;
  size_t mask_stride = (size_t)out_size * out_size;
  for (int t = 0; t < nt; t++) {
    workers.emplace_back([&]() {
      while (true) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        if (!load_frame_impl(paths[i], out_size, mask_images,
                             rgb_out + (size_t)i * rgb_stride,
                             mask_out + (size_t)i * mask_stride))
          failures.fetch_add(1);
      }
    });
  }
  for (auto& w : workers) w.join();
  return failures.load();
}

int forge_io_version() { return 1; }
}
