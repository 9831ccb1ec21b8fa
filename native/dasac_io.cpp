// dasac_io: native image I/O for the host data pipeline.
//
// The reference delegates image decode/resize to PIL's C core through a
// Python multiprocessing DataLoader; here the whole hot path (PNG decode ->
// unfilter -> resize -> batch assembly) is a single C++ library driven by a
// pthread pool, called from Python via ctypes with the GIL released.
//
// Supports non-interlaced 8-bit PNG (gray / RGB / palette / +alpha).  Other
// formats return an error and the Python side falls back to PIL.
//
// Build: make -C native   (links only against system zlib)

#include <zlib.h>

#if defined(USE_LIBDEFLATE) && __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define DASAC_HAVE_LIBDEFLATE 1
#endif

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;     // not a PNG we handle
constexpr int kErrInflate = -3;
constexpr int kErrBounds = -4;
constexpr int kErrAlloc = -5;

struct Image {
  int w = 0, h = 0, c = 0;  // c in {1, 3}
  std::vector<uint8_t> data;  // row-major, packed
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

int decode_png(const std::string& path, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return kErrOpen;
  std::vector<uint8_t> file;
  {
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (n <= 8) { fclose(f); return kErrFormat; }
    file.resize(size_t(n));
    if (fread(file.data(), 1, size_t(n), f) != size_t(n)) {
      fclose(f);
      return kErrOpen;
    }
  }
  fclose(f);

  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (memcmp(file.data(), magic, 8) != 0) return kErrFormat;

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // 3 * n entries

  size_t pos = 8;
  while (pos + 12 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    const uint8_t* type = &file[pos + 4];
    const uint8_t* data = &file[pos + 8];
    if (pos + 12 + len > file.size()) return kErrFormat;
    if (!memcmp(type, "IHDR", 4)) {
      if (len < 13) return kErrFormat;
      w = be32(data);
      h = be32(data + 4);
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
    } else if (!memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (w == 0 || h == 0 || bit_depth != 8 || interlace != 0) return kErrFormat;
  // reject implausible dimensions BEFORE sizing buffers: a hostile IHDR
  // (e.g. 2^31 x 2^31) would otherwise either throw bad_alloc across the C
  // ABI or wrap the size computation and under-allocate while the unfilter
  // loop still writes h full rows (heap overflow)
  if (w > 32768 || h > 32768 ||
      uint64_t(w) * uint64_t(h) > (uint64_t(1) << 28)) {
    return kErrBounds;
  }

  int src_ch;
  switch (color_type) {
    case 0: src_ch = 1; break;  // gray
    case 2: src_ch = 3; break;  // rgb
    case 3: src_ch = 1; break;  // palette indices
    case 4: src_ch = 2; break;  // gray + alpha
    case 6: src_ch = 4; break;  // rgba
    default: return kErrFormat;
  }

  // inflate the filtered scanline stream.  The exact output size is known
  // from IHDR ((stride+1)*h), which lets libdeflate's whole-buffer
  // decompressor run ~2-3x faster than streaming zlib — inflate is ~75% of
  // the decode cost at GTA/Cityscapes frame sizes.
  const size_t stride = size_t(w) * src_ch;
  std::vector<uint8_t> raw((stride + 1) * h);
#ifdef DASAC_HAVE_LIBDEFLATE
  {
    thread_local libdeflate_decompressor* dec =
        libdeflate_alloc_decompressor();
    if (!dec) return kErrInflate;
    size_t actual = 0;
    libdeflate_result rc = libdeflate_zlib_decompress(
        dec, idat.data(), idat.size(), raw.data(), raw.size(), &actual);
    if (rc != LIBDEFLATE_SUCCESS || actual != raw.size()) return kErrInflate;
  }
#else
  {
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return kErrInflate;
    zs.next_in = idat.data();
    zs.avail_in = uInt(idat.size());
    zs.next_out = raw.data();
    zs.avail_out = uInt(raw.size());
    int rc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (rc != Z_STREAM_END && !(rc == Z_OK && zs.avail_out == 0)) {
      return kErrInflate;
    }
  }
#endif

  // unfilter in place into `pix`
  std::vector<uint8_t> pix(stride * h);
  const int bpp = src_ch;  // bytes per pixel (8-bit)
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    const uint8_t* cur_in = src + 1;
    uint8_t* cur = &pix[stride * y];
    const uint8_t* up = y ? &pix[stride * (y - 1)] : nullptr;
    switch (filter) {
      case 0:
        memcpy(cur, cur_in, stride);
        break;
      case 1:  // sub
        for (size_t i = 0; i < stride; ++i) {
          uint8_t left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          cur[i] = uint8_t(cur_in[i] + left);
        }
        break;
      case 2:  // up
        for (size_t i = 0; i < stride; ++i) {
          cur[i] = uint8_t(cur_in[i] + (up ? up[i] : 0));
        }
        break;
      case 3:  // average
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int above = up ? up[i] : 0;
          cur[i] = uint8_t(cur_in[i] + ((left + above) >> 1));
        }
        break;
      case 4:  // paeth
        for (size_t i = 0; i < stride; ++i) {
          int left = i >= size_t(bpp) ? cur[i - bpp] : 0;
          int above = up ? up[i] : 0;
          int corner = (up && i >= size_t(bpp)) ? up[i - bpp] : 0;
          cur[i] = uint8_t(cur_in[i] + paeth(left, above, corner));
        }
        break;
      default:
        return kErrFormat;
    }
  }

  // expand to gray or RGB
  out->w = int(w);
  out->h = int(h);
  if (color_type == 3) {
    if (palette.empty()) return kErrFormat;
    // palette image: keep INDICES as single channel (label maps) unless the
    // caller asked for RGB — we return indices; batch API expands as needed
    out->c = 1;
    out->data = std::move(pix);
    // stash palette for RGB expansion
    out->data.reserve(out->data.size());
  } else if (src_ch == 1) {
    out->c = 1;
    out->data = std::move(pix);
  } else if (src_ch == 2) {
    out->c = 1;
    out->data.resize(size_t(w) * h);
    for (size_t i = 0; i < size_t(w) * h; ++i) out->data[i] = pix[2 * i];
  } else if (src_ch == 3) {
    out->c = 3;
    out->data = std::move(pix);
  } else {  // rgba
    out->c = 3;
    out->data.resize(size_t(w) * h * 3);
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      out->data[3 * i + 0] = pix[4 * i + 0];
      out->data[3 * i + 1] = pix[4 * i + 1];
      out->data[3 * i + 2] = pix[4 * i + 2];
    }
  }
  // expand palette to RGB when a palette exists and the image is used as an
  // RGB input; store palette-expanded copy in a side buffer
  if (color_type == 3 && !palette.empty()) {
    std::vector<uint8_t> rgb(size_t(w) * h * 3);
    size_t n_entries = palette.size() / 3;
    for (size_t i = 0; i < size_t(w) * h; ++i) {
      size_t idx = out->data[i];
      if (idx >= n_entries) idx = 0;
      rgb[3 * i + 0] = palette[3 * idx + 0];
      rgb[3 * i + 1] = palette[3 * idx + 1];
      rgb[3 * i + 2] = palette[3 * idx + 2];
    }
    // decision: callers wanting RGB get the expansion; label maps use the
    // raw indices.  We keep indices in `data` and signal c= -3 for "palette"
    // by storing rgb after indices: simpler to just keep both.
    out->data.insert(out->data.end(), rgb.begin(), rgb.end());
    out->c = -3;  // marker: first w*h bytes = indices, then w*h*3 RGB
  }
  return 0;
}

// ---------------------------------------------------------------------------
// resize
// ---------------------------------------------------------------------------

// bilinear (half-pixel centers) with area-average for strong downscales;
// close to PIL's antialiased BILINEAR for natural images
void resize_u8(const uint8_t* src, int sh, int sw, int c, uint8_t* dst,
               int dh, int dw, bool nearest) {
  if (sh == dh && sw == dw) {
    memcpy(dst, src, size_t(sh) * sw * c);
    return;
  }
  const float sy = float(sh) / dh;
  const float sx = float(sw) / dw;
  if (nearest) {
    for (int y = 0; y < dh; ++y) {
      int yy = int((y + 0.5f) * sy);
      if (yy >= sh) yy = sh - 1;
      for (int x = 0; x < dw; ++x) {
        int xx = int((x + 0.5f) * sx);
        if (xx >= sw) xx = sw - 1;
        memcpy(&dst[(size_t(y) * dw + x) * c], &src[(size_t(yy) * sw + xx) * c],
               c);
      }
    }
    return;
  }
  // triangle filter with support scaled by the downscale factor (antialias)
  const float fy = sy > 1.f ? sy : 1.f;
  const float fx = sx > 1.f ? sx : 1.f;
  const int ry = int(fy) + 1;
  const int rx = int(fx) + 1;
  std::vector<float> acc(c);
  for (int y = 0; y < dh; ++y) {
    float cy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(cy) - ry;
    for (int x = 0; x < dw; ++x) {
      float cx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(cx) - rx;
      float wsum = 0.f;
      for (int k = 0; k < c; ++k) acc[k] = 0.f;
      for (int yy = y0; yy <= y0 + 2 * ry; ++yy) {
        if (yy < 0 || yy >= sh) continue;
        float wy = 1.f - float(yy > cy ? yy - cy : cy - yy) / fy;
        if (wy <= 0.f) continue;
        for (int xx = x0; xx <= x0 + 2 * rx; ++xx) {
          if (xx < 0 || xx >= sw) continue;
          float wx = 1.f - float(xx > cx ? xx - cx : cx - xx) / fx;
          if (wx <= 0.f) continue;
          float wgt = wx * wy;
          const uint8_t* p = &src[(size_t(yy) * sw + xx) * c];
          for (int k = 0; k < c; ++k) acc[k] += wgt * p[k];
          wsum += wgt;
        }
      }
      uint8_t* q = &dst[(size_t(y) * dw + x) * c];
      for (int k = 0; k < c; ++k) {
        float v = wsum > 0.f ? acc[k] / wsum : 0.f;
        q[k] = uint8_t(v < 0.f ? 0.f : (v > 255.f ? 255.f : v + 0.5f));
      }
    }
  }
}

void image_to_rgb(const Image& im, std::vector<uint8_t>* rgb) {
  size_t n = size_t(im.w) * im.h;
  rgb->resize(n * 3);
  if (im.c == 3) {
    memcpy(rgb->data(), im.data.data(), n * 3);
  } else if (im.c == -3) {
    memcpy(rgb->data(), im.data.data() + n, n * 3);  // palette-expanded part
  } else {  // gray
    for (size_t i = 0; i < n; ++i) {
      (*rgb)[3 * i] = (*rgb)[3 * i + 1] = (*rgb)[3 * i + 2] = im.data[i];
    }
  }
}

void image_to_gray(const Image& im, std::vector<uint8_t>* g) {
  size_t n = size_t(im.w) * im.h;
  g->resize(n);
  if (im.c == 1 || im.c == -3) {
    memcpy(g->data(), im.data.data(), n);  // indices / gray as-is
  } else {
    // luminance (PIL 'L' convention)
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = &im.data[3 * i];
      (*g)[i] = uint8_t((299 * p[0] + 587 * p[1] + 114 * p[2] + 500) / 1000);
    }
  }
}

}  // namespace

extern "C" {

// Decode one image+mask pair resized to (out_h, out_w).
// img -> RGB uint8 [out_h, out_w, 3]; mask -> uint8 [out_h, out_w]
// (mask_path may be null: mask filled with `mask_fill`).
// Returns 0 on success, negative error code otherwise.
int dasac_decode_pair(const char* img_path, const char* mask_path, int out_h,
                      int out_w, uint8_t* out_img, uint8_t* out_mask,
                      int mask_fill) {
  // no C++ exception may cross the C ABI into ctypes (it would abort the
  // training process); allocation failure degrades to an error code and the
  // Python side falls back to PIL
  try {
    Image im;
    int rc = decode_png(img_path, &im);
    if (rc) return rc;
    std::vector<uint8_t> rgb;
    image_to_rgb(im, &rgb);
    resize_u8(rgb.data(), im.h, im.w, 3, out_img, out_h, out_w, false);

    if (mask_path && mask_path[0]) {
      Image mk;
      rc = decode_png(mask_path, &mk);
      if (rc) return rc;
      if (mk.w != im.w || mk.h != im.h) return kErrBounds;
      std::vector<uint8_t> gray;
      image_to_gray(mk, &gray);
      resize_u8(gray.data(), mk.h, mk.w, 1, out_mask, out_h, out_w, true);
    } else {
      memset(out_mask, mask_fill, size_t(out_h) * out_w);
    }
    return 0;
  } catch (const std::exception&) {
    return kErrAlloc;
  } catch (...) {
    return kErrAlloc;
  }
}

// Batch decode with a thread pool.  Paths are arrays of C strings; outputs
// are contiguous [n, out_h, out_w, 3] and [n, out_h, out_w].
// Returns the number of successfully decoded pairs; failures are recorded
// per-sample in `status` (0 ok / negative error) for Python-side fallback.
int dasac_decode_batch(const char** img_paths, const char** mask_paths, int n,
                       int out_h, int out_w, uint8_t* out_imgs,
                       uint8_t* out_masks, int* status, int n_threads,
                       int mask_fill) {
  std::atomic<int> next(0);
  std::atomic<int> ok(0);
  const size_t img_stride = size_t(out_h) * out_w * 3;
  const size_t mask_stride = size_t(out_h) * out_w;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = dasac_decode_pair(
          img_paths[i], mask_paths ? mask_paths[i] : nullptr, out_h, out_w,
          out_imgs + img_stride * i, out_masks + mask_stride * i, mask_fill);
      status[i] = rc;
      if (rc == 0) ok.fetch_add(1);
    }
  };

  int t = n_threads < 1 ? 1 : n_threads;
  if (t > n) t = n;
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return ok.load();
}

// Probe a PNG's dimensions without full decode.
int dasac_png_info(const char* path, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  uint8_t head[33];
  size_t n = fread(head, 1, sizeof(head), f);
  fclose(f);
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 33 || memcmp(head, magic, 8) != 0 || memcmp(head + 12, "IHDR", 4)) {
    return kErrFormat;
  }
  *w = int(be32(head + 16));
  *h = int(be32(head + 20));
  return 0;
}

}  // extern "C"
