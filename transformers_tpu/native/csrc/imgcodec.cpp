// Host-side image decode (SURVEY §2.9 torchvision/PIL rows): JPEG via
// libjpeg(-turbo), PNG via libpng — the serving path's decode boundary runs
// native C++ instead of PIL. Guarded with __has_include so the shared
// library still builds on images without the codec headers (the Python side
// then falls back to PIL).
#include <cstdint>
#include <cstdlib>
#include <cstring>

#if defined(__has_include)
#if __has_include(<jpeglib.h>)
#define TTPU_HAVE_JPEG 1
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#endif
#if __has_include(<png.h>)
#define TTPU_HAVE_PNG 1
#include <png.h>
#endif
#endif

extern "C" {

// Returns 1 when this build carries the codec.
int ttpu_img_has_jpeg() {
#ifdef TTPU_HAVE_JPEG
  return 1;
#else
  return 0;
#endif
}
int ttpu_img_has_png() {
#ifdef TTPU_HAVE_PNG
  return 1;
#else
  return 0;
#endif
}

#ifdef TTPU_HAVE_JPEG
struct ttpu_jpeg_err {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

static void ttpu_jpeg_fail(j_common_ptr cinfo) {
  ttpu_jpeg_err* err = reinterpret_cast<ttpu_jpeg_err*>(cinfo->err);
  longjmp(err->jump, 1);
}
#endif

// Decode a JPEG byte buffer into caller-provided RGB8 HWC storage.
// First call with out == nullptr to learn (h, w); then call again with an
// out buffer of h*w*3 bytes. Returns 0 on success, negative on error.
int ttpu_decode_jpeg(const uint8_t* data, int64_t size, uint8_t* out,
                     int32_t* h, int32_t* w) {
#ifdef TTPU_HAVE_JPEG
  jpeg_decompress_struct cinfo;
  ttpu_jpeg_err jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = ttpu_jpeg_fail;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  cinfo.out_color_space = JCS_RGB;
  *h = static_cast<int32_t>(cinfo.image_height);
  *w = static_cast<int32_t>(cinfo.image_width);
  if (out == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  const int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
#else
  (void)data; (void)size; (void)out; (void)h; (void)w;
  return -1;
#endif
}

#ifdef TTPU_HAVE_PNG
struct ttpu_png_reader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

static void ttpu_png_read(png_structp png, png_bytep out, png_size_t n) {
  ttpu_png_reader* r =
      static_cast<ttpu_png_reader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) {
    png_error(png, "truncated png");
    return;
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}
#endif

// Decode a PNG byte buffer to RGB8 HWC (alpha dropped, palettes/gray
// expanded, 16-bit narrowed). Same two-call protocol as the JPEG entry.
int ttpu_decode_png(const uint8_t* data, int64_t size, uint8_t* out,
                    int32_t* h, int32_t* w) {
#ifdef TTPU_HAVE_PNG
  if (size < 8 || png_sig_cmp(data, 0, 8) != 0) return -3;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -4;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -4;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -2;
  }
  ttpu_png_reader reader{data, static_cast<size_t>(size), 0};
  png_set_read_fn(png, &reader, ttpu_png_read);
  png_read_info(png, info);
  *h = static_cast<int32_t>(png_get_image_height(png, info));
  *w = static_cast<int32_t>(png_get_image_width(png, info));
  if (out == nullptr) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  const size_t stride = static_cast<size_t>(*w) * 3;
  for (int32_t y = 0; y < *h; ++y) {
    png_read_row(png, out + y * stride, nullptr);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
#else
  (void)data; (void)size; (void)out; (void)h; (void)w;
  return -1;
#endif
}

}  // extern "C"
