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
#include <zlib.h>

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

// ---------------------------------------------------------------------------
// Minimal .npz reader (zip + deflate + npy header) for RAFT flow files
// (np.savez_compressed(..., flow=[H, W, 2] f32) — data/synthetic.py,
// utils/io_utils.load_optical_flow semantics).
// ---------------------------------------------------------------------------

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  fseek(fp, 0, SEEK_END);
  long sz = ftell(fp);
  fseek(fp, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(fp);
    return false;
  }
  buf->resize((size_t)sz);
  size_t got = fread(buf->data(), 1, (size_t)sz, fp);
  fclose(fp);
  return got == (size_t)sz;
}

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

// Extract the FIRST central-directory entry's payload (raw-inflated if
// deflate). Uses the central directory — local headers written by Python's
// streaming zipfile can carry zero sizes + a data descriptor.
bool zip_first_entry(const std::vector<uint8_t>& zip, std::vector<uint8_t>* out) {
  if (zip.size() < 22) return false;
  // EOCD scan from the end (sig 0x06054b50), comment up to 64 KB
  size_t lo = zip.size() >= 22 + 65536 ? zip.size() - 22 - 65536 : 0;
  size_t eocd = SIZE_MAX;
  for (size_t i = zip.size() - 22 + 1; i-- > lo;) {
    if (rd32(&zip[i]) == 0x06054b50) {
      eocd = i;
      break;
    }
  }
  if (eocd == SIZE_MAX) return false;
  uint32_t cd_off = rd32(&zip[eocd + 16]);
  if ((size_t)cd_off + 46 > zip.size() || rd32(&zip[cd_off]) != 0x02014b50)
    return false;
  const uint8_t* cd = &zip[cd_off];
  uint16_t method = rd16(cd + 10);
  uint32_t csize = rd32(cd + 20);
  uint32_t usize = rd32(cd + 24);
  uint32_t lho = rd32(cd + 42);
  if ((size_t)lho + 30 > zip.size() || rd32(&zip[lho]) != 0x04034b50)
    return false;
  const uint8_t* lh = &zip[lho];
  size_t data_off = (size_t)lho + 30 + rd16(lh + 26) + rd16(lh + 28);
  if (data_off + csize > zip.size()) return false;
  out->resize(usize);
  if (method == 0) {  // stored
    if (csize != usize) return false;
    memcpy(out->data(), &zip[data_off], usize);
    return true;
  }
  if (method != 8) return false;  // only deflate
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -15) != Z_OK) return false;  // raw deflate
  zs.next_in = const_cast<uint8_t*>(&zip[data_off]);
  zs.avail_in = csize;
  zs.next_out = out->data();
  zs.avail_out = usize;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == usize;
}

// Parse an npy buffer: f32/f64, C-order, shape [h, w, 2] or [2, h, w];
// write [h, w, 2] float32 into out.
bool npy_to_flow(const std::vector<uint8_t>& npy, float* out, int h, int w) {
  if (npy.size() < 10 || memcmp(npy.data(), "\x93NUMPY", 6) != 0) return false;
  int major = npy[6];
  size_t hlen, data0;
  if (major == 1) {
    hlen = rd16(&npy[8]);
    data0 = 10 + hlen;
  } else {
    hlen = rd32(&npy[8]);
    data0 = 12 + hlen;
  }
  if (data0 > npy.size()) return false;
  std::string hdr(reinterpret_cast<const char*>(&npy[major == 1 ? 10 : 12]), hlen);
  bool f64;
  if (hdr.find("'<f4'") != std::string::npos) f64 = false;
  else if (hdr.find("'<f8'") != std::string::npos) f64 = true;
  else return false;
  if (hdr.find("'fortran_order': False") == std::string::npos) return false;
  size_t sp = hdr.find("'shape': (");
  if (sp == std::string::npos) return false;
  long dims[3] = {0, 0, 0};
  int nd = sscanf(hdr.c_str() + sp + 10, "%ld, %ld, %ld", &dims[0], &dims[1],
                  &dims[2]);
  if (nd != 3) return false;
  size_t count = (size_t)h * w * 2;
  size_t esz = f64 ? 8 : 4;
  if (npy.size() - data0 < count * esz) return false;
  const uint8_t* src = &npy[data0];
  bool hw2 = dims[0] == h && dims[1] == w && dims[2] == 2;
  bool chw = dims[0] == 2 && dims[1] == h && dims[2] == w;
  if (!hw2 && !chw) return false;

  auto get = [&](size_t idx) -> float {
    if (f64) {
      double d;
      memcpy(&d, src + idx * 8, 8);
      return (float)d;
    }
    float f;
    memcpy(&f, src + idx * 4, 4);
    return f;
  };
  if (hw2) {
    if (!f64) {
      memcpy(out, src, count * 4);
    } else {
      for (size_t i = 0; i < count; i++) out[i] = get(i);
    }
  } else {  // [2, h, w] -> [h, w, 2]
    size_t plane = (size_t)h * w;
    for (size_t px = 0; px < plane; px++) {
      out[px * 2 + 0] = get(px);
      out[px * 2 + 1] = get(plane + px);
    }
  }
  return true;
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

// Decode n RGB images into out[n, h, w, 3] uint8 (wire format for the
// host->device link: 4x fewer bytes than f32; the train step normalizes on
// device). Returns 0 or (1 + index) of the first failure.
int njf_decode_rgb_batch_u8(const char** paths, int n, uint8_t* out, int h,
                            int w, int threads) {
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
    uint8_t* dst = out + (size_t)i * h * w * 3;
    const uint8_t* src = d.data.data();
    if (d.channels == 3) {
      memcpy(dst, src, (size_t)h * w * 3);
    } else {
      for (size_t px = 0; px < (size_t)h * w; px++) {
        dst[px * 3 + 0] = src[px * d.channels + 0];
        dst[px * 3 + 1] = src[px * d.channels + 1];
        dst[px * 3 + 2] = src[px * d.channels + 2];
      }
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

// Load n RAFT-flow .npz files into out[n, h, w, 2] float32.
// Returns 0 on success, or (1 + index) of the first failing file.
int njf_load_flow_npz_batch(const char** paths, int n, float* out, int h,
                            int w, int threads) {
  std::atomic<int> err{0};
  parallel_for(n, threads, [&](int i) {
    if (err.load()) return;
    std::vector<uint8_t> zip, npy;
    if (!read_file(paths[i], &zip) || !zip_first_entry(zip, &npy) ||
        !npy_to_flow(npy, out + (size_t)i * h * w * 2, h, w)) {
      int expected = 0;
      err.compare_exchange_strong(expected, i + 1);
    }
  });
  return err.load();
}

}  // extern "C"
