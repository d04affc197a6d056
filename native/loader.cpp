// Native data loader for instantir_tpu.
//
// The reference's data path is Python/PIL inside torch DataLoader workers;
// this framework's host side replaces it with a small C++ library: libjpeg/
// libpng decode, bilinear shorter-side resize, seeded random crop, and a
// background prefetch thread filling a ring of ready batches so image IO
// overlaps device compute. Exposed through a C ABI consumed with ctypes
// (no pybind11 in this environment).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC ... -ljpeg -lpng).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = w;
  out->h = h;
  out->rgb.resize(size_t(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->rgb.data() + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->w > 0 && out->h > 0;
}

// ---------------------------------------------------------------------------
// resize (bilinear) + crop
// ---------------------------------------------------------------------------

void resize_bilinear(const Image& src, int dw, int dh, Image* dst) {
  dst->w = dw;
  dst->h = dh;
  dst->rgb.resize(size_t(dw) * dh * 3);
  const float sx = float(src.w) / dw, sy = float(src.h) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(src.h - 1, int(fy)));
    int y1 = std::min(src.h - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(src.w - 1, int(fx)));
      int x1 = std::min(src.w - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src.rgb[(size_t(y0) * src.w + x0) * 3 + c];
        float v01 = src.rgb[(size_t(y0) * src.w + x1) * 3 + c];
        float v10 = src.rgb[(size_t(y1) * src.w + x0) * 3 + c];
        float v11 = src.rgb[(size_t(y1) * src.w + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx + v10 * wy * (1 - wx) + v11 * wy * wx;
        dst->rgb[(size_t(y) * dw + x) * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

// shorter-side resize to `size`, then random crop size×size
void sample_crop(const Image& src, int size, std::mt19937_64* rng, uint8_t* out) {
  Image resized;
  const Image* use = &src;
  if (std::min(src.w, src.h) != size) {
    float scale = float(size) / std::min(src.w, src.h);
    int nw = std::max(size, int(src.w * scale + 0.5f));
    int nh = std::max(size, int(src.h * scale + 0.5f));
    resize_bilinear(src, nw, nh, &resized);
    use = &resized;
  }
  std::uniform_int_distribution<int> dx(0, use->w - size), dy(0, use->h - size);
  int left = dx(*rng), top = dy(*rng);
  for (int y = 0; y < size; ++y) {
    std::memcpy(out + size_t(y) * size * 3,
                use->rgb.data() + (size_t(top + y) * use->w + left) * 3, size_t(size) * 3);
  }
}

// ---------------------------------------------------------------------------
// prefetching loader
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> files;
  std::vector<double> cum_weights;  // per-file cumulative sampling weights
  int gt_size = 512;
  int batch = 4;
  std::mt19937_64 rng;

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::queue<std::vector<uint8_t>> ready;
  size_t max_ready = 3;
  std::atomic<bool> stop{false};

  void run() {
    while (!stop.load()) {
      std::vector<uint8_t> buf(size_t(batch) * gt_size * gt_size * 3);
      for (int i = 0; i < batch; ++i) {
        Image img;
        for (int attempt = 0; attempt < 64; ++attempt) {
          double u = std::uniform_real_distribution<double>(0, cum_weights.back())(rng);
          size_t idx = std::lower_bound(cum_weights.begin(), cum_weights.end(), u) - cum_weights.begin();
          if (decode_file(files[std::min(idx, files.size() - 1)].c_str(), &img)) break;
          img = Image();
        }
        if (img.w == 0) {  // all attempts failed: emit gray
          std::memset(buf.data() + size_t(i) * gt_size * gt_size * 3, 128, size_t(gt_size) * gt_size * 3);
          continue;
        }
        sample_crop(img, gt_size, &rng, buf.data() + size_t(i) * gt_size * gt_size * 3);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] { return ready.size() < max_ready || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(buf));
      cv_ready.notify_one();
    }
  }
};

}  // namespace

extern "C" {

// one-shot decode + shorter-side resize + seeded crop; out: size*size*3 uint8
int itir_decode_crop(const char* path, int size, uint64_t seed, uint8_t* out) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  std::mt19937_64 rng(seed);
  sample_crop(img, size, &rng, out);
  return 0;
}

// probe: returns (w<<32)|h, or 0 on failure
uint64_t itir_probe(const char* path) {
  Image img;
  if (!decode_file(path, &img)) return 0;
  return (uint64_t(img.w) << 32) | uint64_t(img.h);
}

void* itir_loader_create(const char** paths, const double* weights, int n_files, int gt_size,
                         int batch, uint64_t seed) {
  auto* l = new Loader();
  l->files.reserve(n_files);
  l->cum_weights.reserve(n_files);
  double acc = 0;
  for (int i = 0; i < n_files; ++i) {
    l->files.emplace_back(paths[i]);
    acc += weights ? weights[i] : 1.0;
    l->cum_weights.push_back(acc);
  }
  l->gt_size = gt_size;
  l->batch = batch;
  l->rng.seed(seed);
  l->worker = std::thread([l] { l->run(); });
  return l;
}

// blocks until a batch is ready; out: batch*gt*gt*3 uint8
int itir_loader_next(void* handle, uint8_t* out) {
  auto* l = static_cast<Loader*>(handle);
  std::vector<uint8_t> buf;
  {
    std::unique_lock<std::mutex> lk(l->mu);
    l->cv_ready.wait(lk, [&] { return !l->ready.empty() || l->stop.load(); });
    if (l->ready.empty()) return -1;
    buf = std::move(l->ready.front());
    l->ready.pop();
    l->cv_space.notify_one();
  }
  std::memcpy(out, buf.data(), buf.size());
  return 0;
}

void itir_loader_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  l->cv_space.notify_all();
  l->cv_ready.notify_all();
  if (l->worker.joinable()) l->worker.join();
  delete l;
}

}  // extern "C"
