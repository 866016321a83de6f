// fastpng: multithreaded PNG batch writer for FID sample dumps.
//
// The reference dumps 50k PNGs per FID evaluation through PIL, single
// threaded (ddim/runners/diffusion.py:347-364; sample_diffusion_ldm.py
// :180-184) — on a TPU host that serializes minutes of pure-Python
// encode behind the accelerator. This native writer encodes RGB8 ->
// PNG (filter None + zlib deflate) across a thread pool, overlapping
// image IO with device compute.
//
// Exposed C API (ctypes, no pybind11 needed):
//   int write_png_batch(const uint8_t* data, int n, int h, int w, int c,
//                       const char* dir, int start_index, int threads,
//                       int compress_level);
// Returns 0 on success, else the count of failed images.
//
// Build: g++ -O3 -shared -fPIC -o libfastpng.so fastpng.cpp -lz -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

void put_be32(std::vector<uint8_t>& out, uint32_t v) {
  out.push_back((v >> 24) & 0xff);
  out.push_back((v >> 16) & 0xff);
  out.push_back((v >> 8) & 0xff);
  out.push_back(v & 0xff);
}

void put_chunk(std::vector<uint8_t>& out, const char type[4],
               const uint8_t* data, size_t len) {
  put_be32(out, static_cast<uint32_t>(len));
  size_t start = out.size();
  out.insert(out.end(), type, type + 4);
  if (len) out.insert(out.end(), data, data + len);
  uint32_t crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, out.data() + start, static_cast<uInt>(len + 4));
  put_be32(out, crc);
}

bool encode_png(const uint8_t* img, int h, int w, int c, int level,
                std::vector<uint8_t>& out) {
  // raw scanlines with filter byte 0
  std::vector<uint8_t> raw(static_cast<size_t>(h) * (1 + w * c));
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (1 + w * c);
    row[0] = 0;
    std::memcpy(row + 1, img + static_cast<size_t>(y) * w * c,
                static_cast<size_t>(w) * c);
  }
  uLongf bound = compressBound(raw.size());
  std::vector<uint8_t> z(bound);
  if (compress2(z.data(), &bound, raw.data(), raw.size(), level) != Z_OK)
    return false;
  z.resize(bound);

  out.clear();
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = (w >> 24) & 0xff; ihdr[1] = (w >> 16) & 0xff;
  ihdr[2] = (w >> 8) & 0xff;  ihdr[3] = w & 0xff;
  ihdr[4] = (h >> 24) & 0xff; ihdr[5] = (h >> 16) & 0xff;
  ihdr[6] = (h >> 8) & 0xff;  ihdr[7] = h & 0xff;
  ihdr[8] = 8;                        // bit depth
  ihdr[9] = (c == 3) ? 2 : (c == 1 ? 0 : 6);  // RGB / gray / RGBA
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);
  put_chunk(out, "IDAT", z.data(), z.size());
  put_chunk(out, "IEND", nullptr, 0);
  return true;
}

}  // namespace

extern "C" int write_png_batch(const uint8_t* data, int n, int h, int w,
                               int c, const char* dir, int start_index,
                               int threads, int compress_level) {
  if (threads <= 0) threads = std::thread::hardware_concurrency();
  if (threads <= 0) threads = 4;
  std::atomic<int> next(0), failures(0);
  const size_t img_sz = static_cast<size_t>(h) * w * c;
  std::string base(dir);

  auto worker = [&]() {
    std::vector<uint8_t> buf;
    char path[4096];
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (!encode_png(data + img_sz * i, h, w, c, compress_level, buf)) {
        failures.fetch_add(1);
        continue;
      }
      std::snprintf(path, sizeof(path), "%s/%05d.png", base.c_str(),
                    start_index + i);
      FILE* f = std::fopen(path, "wb");
      if (!f) { failures.fetch_add(1); continue; }
      size_t written = std::fwrite(buf.data(), 1, buf.size(), f);
      std::fclose(f);
      if (written != buf.size()) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  int nt = std::min(threads, n > 0 ? n : 1);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}
