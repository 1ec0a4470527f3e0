// Native batched image loader: decode (JPEG/PNG) + bilinear resize.
//
// Role: the framework's ingest hot path.  The reference decodes with
// PIL and resizes with cv2 one image at a time inside Python scan loops
// (reference: code/readDFW.py:82, code/readMTP.py:33-36).  This loader
// decodes a whole batch on a C++ thread pool and writes float32 RGB
// directly into a caller-provided buffer shaped (n, out_h, out_w, 3) —
// the layout alink_tpu.data.loader.PersonStacks consumes.
//
// Resize uses cv2.INTER_LINEAR semantics (half-pixel sample grid, no
// antialias), matching alink_tpu.ops.image.resize so host- and
// device-side resizes agree.
//
// C ABI (ctypes-friendly):
//   int alink_decode_resize_batch(const char** paths, int n,
//                                 int out_h, int out_w,
//                                 float* out, int threads);
//   int alink_decode_resize_batch_v2(..., int dct_scale);
// Returns the number of images that failed to decode (their slots are
// zero-filled); never throws across the boundary.
//
// dct_scale != 0 enables libjpeg's fractional-DCT decode: the JPEG is
// decoded at the largest 1/2^k (k<=3) scale whose output still covers
// the resize target, then bilinear-resized the rest of the way.  On
// photos >=2x the target this cuts IDCT+color work ~4-16x per core —
// the host-ingest lever that keeps one loader host ahead of a >4k
// faces/s chip.  It is OFF by default because the decoded pixels are a
// box-filtered approximation of the full-resolution image: bit-parity
// with the PIL fallback (and the reference's PIL+cv2 path) only holds
// with dct_scale=0.

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<unsigned char> rgb;  // h * w * 3
  int h = 0, w = 0;
};

// ---------- JPEG ----------

struct JpegErr {
  jpeg_error_mgr mgr;
  std::jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out, int min_h, int min_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_h > 0 && min_w > 0) {
    // Largest 1/2^k decode whose output still covers the resize target,
    // so the follow-up bilinear only ever downscales (upscaling a
    // scaled decode would lose detail the full decode had).
    cinfo.scale_num = 1;
    for (int denom = 8; denom >= 1; denom >>= 1) {
      cinfo.scale_denom = denom;
      jpeg_calc_output_dimensions(&cinfo);
      if (static_cast<int>(cinfo.output_height) >= min_h &&
          static_cast<int>(cinfo.output_width) >= min_w) {
        break;
      }
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->rgb.data() +
        static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------- PNG ----------

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);            // palettes / low-bit-depth -> 8-bit
  png_set_strip_16(png);          // 16-bit -> 8-bit
  png_set_strip_alpha(png);       // drop alpha
  png_set_gray_to_rgb(png);       // grayscale -> RGB
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  if (png_get_rowbytes(png, info) != static_cast<size_t>(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out, int min_h, int min_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out, min_h, min_w);
  } else if (got >= 8 && !std::memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    ok = decode_png(f, out);  // libpng has no scaled decode
  }
  std::fclose(f);
  return ok;
}

// ---------- resize (cv2 INTER_LINEAR half-pixel grid) ----------

void resize_bilinear(const Image& src, int out_h, int out_w, float* dst) {
  const float sy = static_cast<float>(src.h) / out_h;
  const float sx = static_cast<float>(src.w) / out_w;
  // The x-axis tap indices/weights are row-invariant: hoist them out of
  // the row loop (they were ~40% of the per-pixel work).
  std::vector<int> x0s(out_w), x1s(out_w);
  std::vector<float> wxs(out_w);
  for (int ox = 0; ox < out_w; ++ox) {
    float fx = (ox + 0.5f) * sx - 0.5f;
    int x0 = static_cast<int>(std::floor(fx));
    wxs[ox] = fx - x0;
    x0s[ox] = (x0 < 0 ? 0 : (x0 >= src.w ? src.w - 1 : x0)) * 3;
    x1s[ox] = (x0 + 1 < 0 ? 0 : (x0 + 1 >= src.w ? src.w - 1 : x0 + 1)) * 3;
  }
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= src.h ? src.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= src.h ? src.h - 1 : y0 + 1);
    const unsigned char* rtop =
        src.rgb.data() + static_cast<size_t>(y0c) * src.w * 3;
    const unsigned char* rbot =
        src.rgb.data() + static_cast<size_t>(y1c) * src.w * 3;
    float* orow = dst + static_cast<size_t>(oy) * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      const float wx = wxs[ox];
      const unsigned char* p00 = rtop + x0s[ox];
      const unsigned char* p01 = rtop + x1s[ox];
      const unsigned char* p10 = rbot + x0s[ox];
      const unsigned char* p11 = rbot + x1s[ox];
      float* o = orow + ox * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + wx * (p01[c] - p00[c]);
        float bot = p10[c] + wx * (p11[c] - p10[c]);
        o[c] = top + wy * (bot - top);
      }
    }
  }
}

}  // namespace

extern "C" int alink_decode_resize_batch_v2(const char** paths, int n,
                                            int out_h, int out_w, float* out,
                                            int threads, int dct_scale) {
  if (n <= 0) return 0;
  const size_t img_elems = static_cast<size_t>(out_h) * out_w * 3;
  const int min_h = dct_scale ? out_h : 0;
  const int min_w = dct_scale ? out_w : 0;
  std::atomic<int> next(0), failures(0);
  int nthreads = threads > 0 ? threads : 1;
  if (nthreads > n) nthreads = n;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      Image img;
      float* dst = out + img_elems * i;
      if (decode_file(paths[i], &img, min_h, min_w) && img.h > 0 &&
          img.w > 0) {
        resize_bilinear(img, out_h, out_w, dst);
      } else {
        std::memset(dst, 0, img_elems * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };

  if (nthreads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failures.load();
}

extern "C" int alink_decode_resize_batch(const char** paths, int n,
                                         int out_h, int out_w, float* out,
                                         int threads) {
  return alink_decode_resize_batch_v2(paths, n, out_h, out_w, out, threads,
                                      /*dct_scale=*/0);
}
