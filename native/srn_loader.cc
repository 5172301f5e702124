// Native SRN data-loading pipeline: threaded PNG decode + crop + mask.
//
// The reference leans on torch's native DataLoader workers for input
// (SURVEY §2, SRNDataset row); this is the TPU-framework counterpart — a
// C++ thread pool that decodes PNG files (libpng), derives the
// "all channels != 255" mask, applies the reference's 1/8-margin center crop
// (dataset.py:76-78) and normalizes to float32, writing straight into
// caller-provided (numpy) buffers.  Exposed via a C ABI for ctypes.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC ... -lpng).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // H * W * C
  int width = 0;
  int height = 0;
  int channels = 0;
};

// Decode one PNG file to 8-bit RGB/RGBA/Gray.
bool decode_png(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);
  png_byte color_type = png_get_color_type(png, info);

  // Normalize to 8-bit samples.
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);

  out->width = static_cast<int>(width);
  out->height = static_cast<int>(height);
  out->channels = channels;
  out->data.resize(rowbytes * height);

  std::vector<png_bytep> rows(height);
  for (png_uint_32 y = 0; y < height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

// Decode + mask + crop + normalize one SRN view into float32 buffers.
// color_out: [crop_h, crop_w, channels]; mask_out: [crop_h, crop_w, 1].
// Crop semantics replicate reference dataset.py:76-78 for square images:
// remove height/8 rows and width/8 columns from each side.
bool load_view(const char* path, int expect_h, int expect_w, float* color_out,
               float* mask_out) {
  Image img;
  if (!decode_png(path, &img)) return false;
  if (img.height != expect_h || img.width != expect_w) return false;

  const int ch = img.height / 8, cw = img.width / 8;
  const int out_h = img.height - 2 * cw;  // reference indexes rows by
  const int out_w = img.width - 2 * ch;   // crop_width (dataset.py:77)
  const int C = img.channels;
  const float inv255 = 1.0f / 255.0f;

  for (int y = 0; y < out_h; ++y) {
    const uint8_t* src = img.data.data() + ((y + cw) * img.width + ch) * C;
    float* dst = color_out + (y * out_w) * C;
    float* mdst = mask_out + y * out_w;
    for (int x = 0; x < out_w; ++x) {
      bool all_not_white = true;
      for (int c = 0; c < C; ++c) {
        uint8_t v = src[x * C + c];
        dst[x * C + c] = v * inv255;
        if (v == 255) all_not_white = false;
      }
      mdst[x] = all_not_white ? 1.0f : 0.0f;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Probe a PNG header for (height, width, channels).  Returns 0 on success.
int srn_probe(const char* path, int* height, int* width, int* channels) {
  Image img;
  if (!decode_png(path, &img)) return 1;
  *height = img.height;
  *width = img.width;
  *channels = img.channels;
  return 0;
}

// Load a batch of views with a thread pool.
//   paths:      n null-terminated strings
//   height/width/channels: expected pre-crop geometry (uniform per dataset)
//   colors_out: [n, out_h, out_w, channels] float32
//   masks_out:  [n, out_h, out_w, 1] float32
// Returns number of failed loads (0 = success).
int srn_load_batch(const char** paths, int n, int height, int width,
                   int channels, int num_threads, float* colors_out,
                   float* masks_out) {
  const int ch = height / 8, cw = width / 8;
  const int out_h = height - 2 * cw;
  const int out_w = width - 2 * ch;
  const size_t color_stride = static_cast<size_t>(out_h) * out_w * channels;
  const size_t mask_stride = static_cast<size_t>(out_h) * out_w;

  std::atomic<int> next{0};
  std::atomic<int> failures{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      if (!load_view(paths[i], height, width, colors_out + i * color_stride,
                     masks_out + i * mask_stride))
        failures.fetch_add(1);
    }
  };

  int nt = num_threads > 0 ? num_threads : 1;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
