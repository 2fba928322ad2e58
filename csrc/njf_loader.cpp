// Native host data-loader: threaded PNG/JPEG decode + batch assembly.
//
// The reference leans on torch's C++ DataLoader workers for host-side decode
// throughput (SURVEY.md §2.4); this is the TPU build's equivalent: a small
// C-ABI library (consumed via ctypes, no pybind11) that decodes a batch of
// image files in parallel straight into one preallocated float32 NHWC buffer
// — no per-image Python objects, no GIL on the decode path.
//
// Exports:
//   njf_decode_rgb_batch(paths, n, out, h, w, threads)       uint8 -> f32/255
//   njf_decode_depth_batch(paths, n, out, h, w, scale, threads)
//       16-bit grayscale PNG (or 8-bit) -> f32 * scale
//   njf_version()
//
// All images in a batch must share (h, w); mismatches report an error index.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Decoded {
  std::vector<uint8_t> data;  // row-major, channels interleaved
  int h = 0, w = 0, channels = 0, bit_depth = 8;
  std::vector<uint16_t> data16;  // used when bit_depth == 16
};

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i];
    char b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

bool decode_png(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  int w = png_get_image_width(png, info);
  int h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  color = png_get_color_type(png, info);
  depth = png_get_bit_depth(png, info);
  int channels = png_get_channels(png, info);

  out->h = h;
  out->w = w;
  out->channels = channels;
  out->bit_depth = depth;

  size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<png_bytep> rows(h);
  if (depth == 16) {
    png_set_swap(png);  // PNG is big-endian; we want host (little) endian
    out->data16.resize((size_t)h * w * channels);
    for (int y = 0; y < h; y++)
      rows[y] = reinterpret_cast<png_bytep>(out->data16.data() + (size_t)y * w * channels);
  } else {
    out->data.resize((size_t)h * rowbytes);
    for (int y = 0; y < h; y++) rows[y] = out->data.data() + (size_t)y * rowbytes;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(const char* path, Decoded* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->channels = 3;
  out->bit_depth = 8;
  out->data.resize((size_t)out->h * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

bool decode_any(const char* path, Decoded* out) {
  std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, out);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) return decode_jpeg(path, out);
  return decode_png(path, out) || decode_jpeg(path, out);
}

// Parallel for over items with a shared atomic cursor.
template <typename F>
void parallel_for(int n, int threads, F&& fn) {
  if (threads <= 1) {
    for (int i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<int> cursor{0};
  std::vector<std::thread> pool;
  int t = std::min(threads, n);
  pool.reserve(t);
  for (int k = 0; k < t; k++) {
    pool.emplace_back([&] {
      for (;;) {
        int i = cursor.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

const char* njf_version() { return "njf_loader 0.1"; }

// Decode n RGB images into out[n, h, w, 3] float32 in [0, 1].
// Returns 0 on success, or (1 + index) of the first failing file.
int njf_decode_rgb_batch(const char** paths, int n, float* out, int h, int w,
                         int threads) {
  std::atomic<int> err{0};
  parallel_for(n, threads, [&](int i) {
    if (err.load()) return;
    Decoded d;
    if (!decode_any(paths[i], &d) || d.h != h || d.w != w || d.bit_depth != 8 ||
        d.channels < 3) {
      int expected = 0;
      err.compare_exchange_strong(expected, i + 1);
      return;
    }
    float* dst = out + (size_t)i * h * w * 3;
    const uint8_t* src = d.data.data();
    const float k = 1.0f / 255.0f;
    for (size_t px = 0; px < (size_t)h * w; px++) {
      dst[px * 3 + 0] = src[px * d.channels + 0] * k;
      dst[px * 3 + 1] = src[px * d.channels + 1] * k;
      dst[px * 3 + 2] = src[px * d.channels + 2] * k;
    }
  });
  return err.load();
}

// Decode n single-channel depth PNGs (16- or 8-bit) into out[n, h, w] float32
// scaled by `scale`. Returns 0 or (1 + index) of the first failure.
int njf_decode_depth_batch(const char** paths, int n, float* out, int h, int w,
                           float scale, int threads) {
  std::atomic<int> err{0};
  parallel_for(n, threads, [&](int i) {
    if (err.load()) return;
    Decoded d;
    if (!decode_png(paths[i], &d) || d.h != h || d.w != w) {
      int expected = 0;
      err.compare_exchange_strong(expected, i + 1);
      return;
    }
    float* dst = out + (size_t)i * h * w;
    if (d.bit_depth == 16) {
      const uint16_t* src = d.data16.data();
      for (size_t px = 0; px < (size_t)h * w; px++)
        dst[px] = src[px * d.channels] * scale;
    } else {
      const uint8_t* src = d.data.data();
      for (size_t px = 0; px < (size_t)h * w; px++)
        dst[px] = src[px * d.channels] * scale;
    }
  });
  return err.load();
}

}  // extern "C"
