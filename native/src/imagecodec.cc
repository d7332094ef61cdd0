// Native image postprocessing for the serving path.
//
// The reference leans on native code only through its Python deps (OpenCV,
// torch CUDA kernels — SURVEY.md §2.3); this library is the TPU framework's
// equivalent host-side native component: the latency-critical postprocess
// between device output and HTTP response bytes. Exposed via ctypes
// (runtime/native.py); pure-Python fallbacks exist for environments without
// a toolchain.
//
// Functions:
//   dsc_tensor_to_u8 : fp32 [-1,1] NHWC -> uint8, multithreaded
//   dsc_encode_png   : RGB8 -> PNG bytes (zlib deflate)
//   dsc_make_grid    : contact sheet for latent-preview galleries

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

// fp32 in [-1, 1] -> uint8 [0, 255] with clamp + round-half-away.
void dsc_tensor_to_u8(const float* in, uint8_t* out, int64_t n,
                      int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(
        std::max(1u, std::thread::hardware_concurrency()));
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, std::max<int64_t>(1, n / (1 << 16))));
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) {
      float v = (in[i] * 0.5f + 0.5f) * 255.0f;
      v = std::min(255.0f, std::max(0.0f, v));
      out[i] = static_cast<uint8_t>(v + 0.5f);
    }
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=]() {
      for (int64_t i = lo; i < hi; ++i) {
        float v = (in[i] * 0.5f + 0.5f) * 255.0f;
        v = std::min(255.0f, std::max(0.0f, v));
        out[i] = static_cast<uint8_t>(v + 0.5f);
      }
    });
  }
  for (auto& th : threads) th.join();
}

static void put_u32be(std::vector<uint8_t>& buf, uint32_t v) {
  buf.push_back((v >> 24) & 0xff);
  buf.push_back((v >> 16) & 0xff);
  buf.push_back((v >> 8) & 0xff);
  buf.push_back(v & 0xff);
}

static void put_chunk(std::vector<uint8_t>& buf, const char type[4],
                      const uint8_t* data, uint32_t len) {
  put_u32be(buf, len);
  size_t start = buf.size();
  buf.insert(buf.end(), type, type + 4);
  if (len) buf.insert(buf.end(), data, data + len);
  uint32_t crc = crc32(0L, buf.data() + start, 4 + len);
  put_u32be(buf, crc);
}

// Encode H x W RGB8 into PNG. Returns number of bytes written, or -needed
// if out_cap is too small, or 0 on error. compression: zlib level 0-9.
int64_t dsc_encode_png(const uint8_t* rgb, int width, int height,
                       uint8_t* out, int64_t out_cap, int compression) {
  // filter type 0 per scanline
  std::vector<uint8_t> raw(static_cast<size_t>(height) * (width * 3 + 1));
  for (int y = 0; y < height; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (width * 3 + 1);
    row[0] = 0;
    std::memcpy(row + 1, rgb + static_cast<size_t>(y) * width * 3,
                static_cast<size_t>(width) * 3);
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(),
                std::min(9, std::max(0, compression))) != Z_OK) {
    return 0;
  }

  std::vector<uint8_t> png;
  png.reserve(comp_cap + 128);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
                                 0x0a};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (width >> 24) & 0xff;
  ihdr[1] = (width >> 16) & 0xff;
  ihdr[2] = (width >> 8) & 0xff;
  ihdr[3] = width & 0xff;
  ihdr[4] = (height >> 24) & 0xff;
  ihdr[5] = (height >> 16) & 0xff;
  ihdr[6] = (height >> 8) & 0xff;
  ihdr[7] = height & 0xff;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter
  ihdr[12] = 0;  // interlace
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), static_cast<uint32_t>(comp_cap));
  put_chunk(png, "IEND", nullptr, 0);

  if (static_cast<int64_t>(png.size()) > out_cap) {
    return -static_cast<int64_t>(png.size());
  }
  std::memcpy(out, png.data(), png.size());
  return static_cast<int64_t>(png.size());
}

// Compose n images (each h x w x 3 u8, contiguous) into a grid with `cols`
// columns. out must hold rows*h * cols*w * 3 bytes.
void dsc_make_grid(const uint8_t* imgs, int n, int h, int w, int cols,
                   uint8_t* out) {
  int rows = (n + cols - 1) / cols;
  int gw = cols * w;
  std::memset(out, 0,
              static_cast<size_t>(rows) * h * gw * 3);
  for (int i = 0; i < n; ++i) {
    int r = i / cols, c = i % cols;
    const uint8_t* src = imgs + static_cast<size_t>(i) * h * w * 3;
    for (int y = 0; y < h; ++y) {
      uint8_t* dst =
          out + ((static_cast<size_t>(r) * h + y) * gw + c * w) * 3;
      std::memcpy(dst, src + static_cast<size_t>(y) * w * 3,
                  static_cast<size_t>(w) * 3);
    }
  }
}

}  // extern "C"
