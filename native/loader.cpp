// Native multithreaded dataset preloader for instag_tpu.
//
// The training pipeline preloads every frame of a clip (images, torso
// composites, parsing masks — hundreds of files, ~12 GB per 5 min of video
// in the reference's README "Memory Hints"). The reference does this
// serially through PIL (scene/dataset_readers.py:221-238); here a C++
// thread pool decodes JPEG/PNG straight into one preallocated contiguous
// uint8 tensor, exposed to Python via a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o libinstag_loader.so
//        -ljpeg -lpng -pthread
// (the Python wrapper builds this lazily and falls back to PIL).

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file into dst (h*w*3, RGB). Returns 0 on success.
int decode_jpeg(const char* path, unsigned char* dst, int h, int w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height != h || (int)cinfo.output_width != w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 3;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = dst + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode one PNG into dst with `channels` (3=RGB or 4=RGBA). 0 on success.
int decode_png(const char* path, unsigned char* dst, int h, int w,
               int channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) { fclose(f); return 2; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return 2; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 3;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if ((int)width != w || (int)height != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 4;
  }
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (channels == 4) {
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);  // ensure alpha present
  } else if (channels == 3 &&
             (color & PNG_COLOR_MASK_ALPHA)) {
    png_set_strip_alpha(png);
  }
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = dst + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

// Generic parallel runner over a file list.
template <typename Fn>
int run_pool(int n, int num_threads, Fn&& fn) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (fn(i) != 0) failures.fetch_add(1);
    }
  };
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 4;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // namespace

extern "C" {

// paths: array of n C strings; out: n*h*w*3 uint8. Returns #failures.
int load_jpeg_batch(const char** paths, int n, unsigned char* out, int h,
                    int w, int num_threads) {
  return run_pool(n, num_threads, [&](int i) {
    return decode_jpeg(paths[i], out + (size_t)i * h * w * 3, h, w);
  });
}

// channels 3 or 4. Returns #failures.
int load_png_batch(const char** paths, int n, unsigned char* out, int h,
                   int w, int channels, int num_threads) {
  return run_pool(n, num_threads, [&](int i) {
    return decode_png(paths[i], out + (size_t)i * h * w * channels, h, w,
                      channels);
  });
}

}  // extern "C"
