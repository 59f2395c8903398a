// cnr_native: native runtime components for cudaneuralrender_tpu.
//
// TPU-native equivalents of the reference renderer's native runtime pieces:
//   * PNG encode/decode  — replaces the vendored lodepng
//     (reference src/common/lodepng.{h,cpp}) with a small zlib-backed codec.
//   * Async frame writer — replaces the CUDA-GL PBO write-back path
//     (reference src/main.cpp:130-205): a worker-thread pool that encodes and
//     writes frames off the render thread, so turntable/animation rendering
//     overlaps disk I/O instead of serializing on it.
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image). All buffers are 8-bit RGBA (or RGB/gray via the channels arg).
//
// Build: make -C native   ->  native/libcnr_native.so

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// PNG primitives
// ---------------------------------------------------------------------------

constexpr uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

uint32_t crc_table[256];
bool crc_ready = false;

void init_crc() {
  if (crc_ready) return;
  for (uint32_t n = 0; n < 256; n++) {
    uint32_t c = n;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xedb88320u ^ (c >> 1) : c >> 1;
    crc_table[n] = c;
  }
  crc_ready = true;
}

uint32_t crc32_update(uint32_t crc, const uint8_t* buf, size_t len) {
  init_crc();
  uint32_t c = crc ^ 0xffffffffu;
  for (size_t i = 0; i < len; i++) c = crc_table[(c ^ buf[i]) & 0xff] ^ (c >> 8);
  return c ^ 0xffffffffu;
}

void put_u32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

uint32_t read_u32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) |
         uint32_t(p[3]);
}

void write_chunk(std::vector<uint8_t>& out, const char type[4],
                 const uint8_t* data, size_t len) {
  put_u32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32_update(0, out.data() + start, len + 4);
  put_u32(out, crc);
}

bool zlib_deflate(const std::vector<uint8_t>& in, std::vector<uint8_t>& out,
                  int level) {
  uLongf bound = compressBound(in.size());
  out.resize(bound);
  int rc = compress2(out.data(), &bound, in.data(), in.size(), level);
  if (rc != Z_OK) return false;
  out.resize(bound);
  return true;
}

bool zlib_inflate(const uint8_t* in, size_t in_len, std::vector<uint8_t>& out,
                  size_t expected) {
  out.resize(expected);
  uLongf dst = expected;
  int rc = uncompress(out.data(), &dst, in, in_len);
  if (rc != Z_OK || dst != expected) return false;
  return true;
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Encode 8-bit image (channels = 1, 3 or 4) into a PNG byte stream.
bool encode_png_mem(const uint8_t* pixels, uint32_t w, uint32_t h, int channels,
                    std::vector<uint8_t>& png, int level) {
  if (!(channels == 1 || channels == 3 || channels == 4)) return false;
  uint8_t color_type = channels == 1 ? 0 : (channels == 3 ? 2 : 6);

  // raw scanlines with filter byte 0
  size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw((stride + 1) * h);
  for (uint32_t y = 0; y < h; y++) {
    raw[y * (stride + 1)] = 0;
    memcpy(&raw[y * (stride + 1) + 1], pixels + y * stride, stride);
  }
  std::vector<uint8_t> idat;
  if (!zlib_deflate(raw, idat, level)) return false;

  png.clear();
  png.insert(png.end(), kPngSig, kPngSig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;           // bit depth
  ihdr[9] = color_type;  // color type
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  write_chunk(png, "IHDR", ihdr, 13);
  write_chunk(png, "IDAT", idat.data(), idat.size());
  write_chunk(png, "IEND", nullptr, 0);
  return true;
}

// Unfilter PNG scanlines (raw = h * (stride+1) bytes with a leading filter
// byte each) into a contiguous pixel buffer. `bpp` is the filter's byte
// distance (bytes per complete pixel, min 1 — for sub-byte palette indices
// the spec fixes it at 1).
static bool unfilter_scanlines(const std::vector<uint8_t>& raw, uint32_t h,
                               size_t stride, int bpp,
                               std::vector<uint8_t>& pix) {
  pix.resize(stride * h);
  for (uint32_t y = 0; y < h; y++) {
    uint8_t filter = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &pix[y * stride];
    const uint8_t* up = y ? &pix[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; x++) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
  }
  return true;
}

// Decode a non-interlaced PNG (8-bit gray / gray+alpha / RGB / RGBA, or
// palette at bit depth 1/2/4/8 with optional tRNS alpha) to RGBA.
bool decode_png_mem(const uint8_t* data, size_t len, std::vector<uint8_t>& rgba,
                    uint32_t* out_w, uint32_t* out_h) {
  if (len < 8 || memcmp(data, kPngSig, 8) != 0) return false;
  size_t pos = 8;
  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat, palette, trns;

  while (pos + 8 <= len) {
    uint32_t clen = read_u32(data + pos);
    const char* type = reinterpret_cast<const char*>(data + pos + 4);
    const uint8_t* cdata = data + pos + 8;
    if (pos + 12 + clen > len) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (clen != 13) return false;
      w = read_u32(cdata);
      h = read_u32(cdata + 4);
      bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
    } else if (memcmp(type, "PLTE", 4) == 0) {
      if (clen % 3 || clen > 256 * 3) return false;
      palette.assign(cdata, cdata + clen);
    } else if (memcmp(type, "tRNS", 4) == 0) {
      trns.assign(cdata, cdata + clen);
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (!w || !h || interlace != 0) return false;

  if (color_type == 3) {
    // Palette image: scanlines carry packed indices (MSB-first within a
    // byte below depth 8); PLTE maps index -> rgb, tRNS -> alpha.
    if (!(bit_depth == 1 || bit_depth == 2 || bit_depth == 4 ||
          bit_depth == 8) || palette.empty())
      return false;
    size_t stride = (size_t(w) * bit_depth + 7) / 8;
    std::vector<uint8_t> raw, pix;
    if (!zlib_inflate(idat.data(), idat.size(), raw, (stride + 1) * h))
      return false;
    if (!unfilter_scanlines(raw, h, stride, 1, pix)) return false;
    size_t n_entries = palette.size() / 3;
    rgba.resize(size_t(w) * h * 4);
    for (uint32_t y = 0; y < h; y++) {
      const uint8_t* row = &pix[y * stride];
      for (uint32_t x = 0; x < w; x++) {
        uint32_t idx;
        if (bit_depth == 8) {
          idx = row[x];
        } else {
          uint32_t bitpos = x * bit_depth;
          idx = (row[bitpos >> 3] >> (8 - bit_depth - (bitpos & 7))) &
                ((1u << bit_depth) - 1);
        }
        if (idx >= n_entries) return false;
        uint8_t* d = &rgba[(size_t(y) * w + x) * 4];
        d[0] = palette[idx * 3];
        d[1] = palette[idx * 3 + 1];
        d[2] = palette[idx * 3 + 2];
        d[3] = idx < trns.size() ? trns[idx] : 255;
      }
    }
    *out_w = w;
    *out_h = h;
    return true;
  }

  if (bit_depth != 8) return false;
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return false;
  }

  size_t stride = size_t(w) * channels;
  std::vector<uint8_t> raw, pix;
  if (!zlib_inflate(idat.data(), idat.size(), raw, (stride + 1) * h)) return false;
  if (!unfilter_scanlines(raw, h, stride, channels, pix)) return false;

  // expand to RGBA
  rgba.resize(size_t(w) * h * 4);
  for (size_t i = 0; i < size_t(w) * h; i++) {
    const uint8_t* s = &pix[i * channels];
    uint8_t* d = &rgba[i * 4];
    switch (channels) {
      case 1: d[0] = d[1] = d[2] = s[0]; d[3] = 255; break;
      case 2: d[0] = d[1] = d[2] = s[0]; d[3] = s[1]; break;
      case 3: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = 255; break;
      case 4: memcpy(d, s, 4); break;
    }
  }
  *out_w = w;
  *out_h = h;
  return true;
}

bool write_file(const char* path, const uint8_t* data, size_t len) {
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  size_t n = fwrite(data, 1, len, f);
  fclose(f);
  return n == len;
}

// ---------------------------------------------------------------------------
// Async frame writer (worker pool)
// ---------------------------------------------------------------------------

struct FrameJob {
  std::string path;
  std::vector<uint8_t> pixels;
  uint32_t w, h;
  int channels;
};

class FrameWriter {
 public:
  explicit FrameWriter(int n_threads) : stop_(false), errors_(0), pending_(0) {
    for (int i = 0; i < n_threads; i++)
      workers_.emplace_back([this] { worker(); });
  }

  ~FrameWriter() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void enqueue(FrameJob&& job) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      jobs_.push_back(std::move(job));
      pending_++;
    }
    cv_.notify_one();
  }

  void flush() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

  int errors() const { return errors_.load(); }

 private:
  void worker() {
    for (;;) {
      FrameJob job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
        if (jobs_.empty()) {
          if (stop_) return;
          continue;
        }
        job = std::move(jobs_.front());
        jobs_.pop_front();
      }
      std::vector<uint8_t> png;
      bool ok = encode_png_mem(job.pixels.data(), job.w, job.h, job.channels,
                               png, Z_DEFAULT_COMPRESSION) &&
                write_file(job.path.c_str(), png.data(), png.size());
      if (!ok) errors_++;
      {
        std::unique_lock<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  std::deque<FrameJob> jobs_;
  std::vector<std::thread> workers_;
  bool stop_;
  std::atomic<int> errors_;
  int pending_;
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Returns 0 on success. Encodes and writes synchronously.
int cnr_encode_png(const char* path, const uint8_t* pixels, uint32_t w,
                   uint32_t h, int channels, int level) {
  std::vector<uint8_t> png;
  if (!encode_png_mem(pixels, w, h, channels, png, level)) return 1;
  return write_file(path, png.data(), png.size()) ? 0 : 2;
}

// Two-phase decode: first call with rgba_out=null to get dimensions, then
// call again with a w*h*4 buffer.
int cnr_decode_png(const uint8_t* data, size_t len, uint8_t* rgba_out,
                   uint32_t* w, uint32_t* h) {
  std::vector<uint8_t> rgba;
  if (!decode_png_mem(data, len, rgba, w, h)) return 1;
  if (rgba_out) memcpy(rgba_out, rgba.data(), rgba.size());
  return 0;
}

void* cnr_writer_create(int n_threads) {
  return new FrameWriter(n_threads > 0 ? n_threads : 2);
}

void cnr_writer_enqueue(void* writer, const char* path, const uint8_t* pixels,
                        uint32_t w, uint32_t h, int channels) {
  FrameJob job;
  job.path = path;
  job.pixels.assign(pixels, pixels + size_t(w) * h * channels);
  job.w = w;
  job.h = h;
  job.channels = channels;
  static_cast<FrameWriter*>(writer)->enqueue(std::move(job));
}

int cnr_writer_flush(void* writer) {
  auto* fw = static_cast<FrameWriter*>(writer);
  fw->flush();
  return fw->errors();
}

void cnr_writer_destroy(void* writer) {
  delete static_cast<FrameWriter*>(writer);
}

}  // extern "C"
