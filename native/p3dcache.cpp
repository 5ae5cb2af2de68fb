// p3dcache — native host data plane for pose3d_tpu.
//
// Role: the reference implements its sample cache and batch assembly in C++
// (hdf5handler + the networkSolver producer threads).  In the rebuild the
// default path keeps every sample resident in device HBM; this library is
// the out-of-core complement: a flat, mmap-able cache file plus a
// multithreaded gather that assembles a batch of samples into one
// contiguous buffer ready for a single host->device transfer.
//
// File layout (little-endian):
//   [0]  u64 magic 0x50334443414348"\0"  ("P3DCACH")
//   [8]  u32 version (1)
//   [12] u32 n, c, h, w, label_dim        (5 x u32)
//   [32] f32 data  [n * c * h * w]
//   [..] f32 label [n * label_dim]
//
// C API (ctypes-friendly, no C++ types across the boundary).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0x503344434143481ULL;
constexpr uint32_t kVersion = 1;

struct Header {
  uint64_t magic;
  uint32_t version;
  uint32_t n, c, h, w, label_dim;
  uint32_t pad;
};
static_assert(sizeof(Header) == 40, "header layout");

struct Cache {
  int fd = -1;
  size_t bytes = 0;
  const uint8_t* base = nullptr;
  Header hdr{};
  const float* data = nullptr;
  const float* labels = nullptr;

  size_t sample_floats() const {
    return size_t(hdr.c) * hdr.h * hdr.w;
  }
};

void parallel_for(int64_t count, int threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (threads <= 1 || count < 2 * threads) {
    fn(0, count);
    return;
  }
  std::vector<std::thread> pool;
  int64_t chunk = (count + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(count, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Write a cache file from contiguous float arrays.  Returns 0 on success.
int p3d_cache_write(const char* path, const float* data, const float* labels,
                    uint32_t n, uint32_t c, uint32_t h, uint32_t w,
                    uint32_t label_dim) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header hdr{kMagic, kVersion, n, c, h, w, label_dim, 0};
  size_t dn = size_t(n) * c * h * w;
  size_t ln = size_t(n) * label_dim;
  int ok = fwrite(&hdr, sizeof(hdr), 1, f) == 1 &&
           fwrite(data, sizeof(float), dn, f) == dn &&
           fwrite(labels, sizeof(float), ln, f) == ln;
  fclose(f);
  return ok ? 0 : -2;
}

// Open + mmap.  Returns an opaque handle or null.
void* p3d_cache_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || size_t(st.st_size) < sizeof(Header)) {
    close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* cache = new Cache;
  cache->fd = fd;
  cache->bytes = st.st_size;
  cache->base = static_cast<const uint8_t*>(base);
  std::memcpy(&cache->hdr, base, sizeof(Header));
  if (cache->hdr.magic != kMagic || cache->hdr.version != kVersion) {
    munmap(base, st.st_size);
    close(fd);
    delete cache;
    return nullptr;
  }
  cache->data = reinterpret_cast<const float*>(cache->base + sizeof(Header));
  cache->labels = cache->data +
                  size_t(cache->hdr.n) * cache->sample_floats();
  return cache;
}

// dims_out: n, c, h, w, label_dim
void p3d_cache_info(void* handle, uint32_t* dims_out) {
  auto* cache = static_cast<Cache*>(handle);
  dims_out[0] = cache->hdr.n;
  dims_out[1] = cache->hdr.c;
  dims_out[2] = cache->hdr.h;
  dims_out[3] = cache->hdr.w;
  dims_out[4] = cache->hdr.label_dim;
}

// Gather samples by index into contiguous out buffers (batch assembly).
// out_data must hold nidx*c*h*w floats, out_labels nidx*label_dim.
// Out-of-range indices are clamped.  Returns 0.
int p3d_cache_gather(void* handle, const int64_t* idx, int64_t nidx,
                     float* out_data, float* out_labels, int threads) {
  auto* cache = static_cast<Cache*>(handle);
  const size_t sf = cache->sample_floats();
  const size_t ld = cache->hdr.label_dim;
  const int64_t n = cache->hdr.n;
  parallel_for(nidx, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t j = idx[i];
      if (j < 0) j = 0;
      if (j >= n) j = n - 1;
      std::memcpy(out_data + size_t(i) * sf, cache->data + size_t(j) * sf,
                  sf * sizeof(float));
      std::memcpy(out_labels + size_t(i) * ld,
                  cache->labels + size_t(j) * ld, ld * sizeof(float));
    }
  });
  return 0;
}

// CHW -> HWC conversion for a batch (the cache keeps the reference's CHW
// on-disk layout; device arrays are NHWC).  Threaded.
int p3d_chw_to_hwc(const float* in, float* out, int64_t nbatch, int64_t c,
                   int64_t h, int64_t w, int threads) {
  const int64_t plane = h * w;
  parallel_for(nbatch, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const float* src = in + b * c * plane;
      float* dst = out + b * c * plane;
      for (int64_t ch = 0; ch < c; ++ch)
        for (int64_t p = 0; p < plane; ++p)
          dst[p * c + ch] = src[ch * plane + p];
    }
  });
  return 0;
}

int p3d_hwc_to_chw(const float* in, float* out, int64_t nbatch, int64_t c,
                   int64_t h, int64_t w, int threads) {
  const int64_t plane = h * w;
  parallel_for(nbatch, threads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const float* src = in + b * c * plane;
      float* dst = out + b * c * plane;
      for (int64_t p = 0; p < plane; ++p)
        for (int64_t ch = 0; ch < c; ++ch)
          dst[ch * plane + p] = src[p * c + ch];
    }
  });
  return 0;
}

void p3d_cache_close(void* handle) {
  auto* cache = static_cast<Cache*>(handle);
  if (!cache) return;
  munmap(const_cast<uint8_t*>(cache->base), cache->bytes);
  close(cache->fd);
  delete cache;
}

}  // extern "C"
