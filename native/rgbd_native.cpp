// Native data-path for the TPU RGB-D engine.
//
// The reference library leans on OpenCV's C++ image I/O for its loader
// (SURVEY.md §2.1 "TUM dataset loader", L4); this is the same component
// TPU-side: a small C++ decode/prefetch core (libpng + zlib, no OpenCV
// dependency) exposed through a C ABI that Python binds with ctypes
// (data/native_loader.py). Decoding 16-bit depth PNGs is the host-side
// cost of the odometry pipeline; doing it here keeps the Python thread
// free to drive the device.
//
// Exported ABI (all return 0 on success, negative on error):
//   rgbd_png_dims(path, &w, &h, &channels, &bit_depth)
//   rgbd_decode_depth16(path, out_u16, capacity_px)   // 16-bit gray PNG
//   rgbd_decode_gray8(path, out_u8, capacity_px)      // any PNG -> 8-bit luma
//   rgbd_version()

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct PngReader {
  FILE* f = nullptr;
  png_structp png = nullptr;
  png_infop info = nullptr;

  ~PngReader() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    if (f) fclose(f);
  }

  int open(const char* path) {
    f = fopen(path, "rb");
    if (!f) return -1;
    unsigned char sig[8];
    if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return -2;
    png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return -3;
    info = png_create_info_struct(png);
    if (!info) return -3;
    if (setjmp(png_jmpbuf(png))) return -4;
    png_init_io(png, f);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    return 0;
  }
};

}  // namespace

extern "C" {

int rgbd_version() { return 1; }

int rgbd_png_dims(const char* path, int* w, int* h, int* channels, int* bit_depth) {
  PngReader r;
  int rc = r.open(path);
  if (rc) return rc;
  *w = png_get_image_width(r.png, r.info);
  *h = png_get_image_height(r.png, r.info);
  *channels = png_get_channels(r.png, r.info);
  *bit_depth = png_get_bit_depth(r.png, r.info);
  return 0;
}

// 16-bit grayscale PNG (TUM depth) -> uint16 row-major, native endianness.
int rgbd_decode_depth16(const char* path, uint16_t* out, int64_t capacity_px) {
  PngReader r;
  int rc = r.open(path);
  if (rc) return rc;
  if (setjmp(png_jmpbuf(r.png))) return -4;
  const int w = png_get_image_width(r.png, r.info);
  const int h = png_get_image_height(r.png, r.info);
  if (png_get_bit_depth(r.png, r.info) != 16 ||
      png_get_channels(r.png, r.info) != 1)
    return -5;
  if (static_cast<int64_t>(w) * h > capacity_px) return -6;
  png_set_swap(r.png);  // PNG is big-endian; host is little-endian.
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = reinterpret_cast<png_bytep>(out + static_cast<int64_t>(y) * w);
  png_read_image(r.png, rows.data());
  return 0;
}

// Any PNG -> 8-bit luma (BT.601 integer approximation), row-major.
int rgbd_decode_gray8(const char* path, uint8_t* out, int64_t capacity_px) {
  PngReader r;
  int rc = r.open(path);
  if (rc) return rc;
  if (setjmp(png_jmpbuf(r.png))) return -4;
  png_set_expand(r.png);          // palettes / low-bit gray -> 8-bit
  png_set_strip_16(r.png);        // 16-bit -> 8-bit
  png_set_strip_alpha(r.png);
  png_read_update_info(r.png, r.info);
  const int w = png_get_image_width(r.png, r.info);
  const int h = png_get_image_height(r.png, r.info);
  const int ch = png_get_channels(r.png, r.info);
  if (static_cast<int64_t>(w) * h > capacity_px) return -6;
  if (ch != 1 && ch != 3) return -5;
  std::vector<uint8_t> buf(static_cast<size_t>(w) * h * ch);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = buf.data() + static_cast<size_t>(y) * w * ch;
  png_read_image(r.png, rows.data());
  if (ch == 1) {
    std::memcpy(out, buf.data(), static_cast<size_t>(w) * h);
  } else {
    const uint8_t* p = buf.data();
    for (int64_t i = 0, n = static_cast<int64_t>(w) * h; i < n; ++i, p += 3) {
      // TUM rgb files are RGB order; integer BT.601 luma.
      out[i] = static_cast<uint8_t>((77 * p[0] + 150 * p[1] + 29 * p[2]) >> 8);
    }
  }
  return 0;
}

}  // extern "C"
