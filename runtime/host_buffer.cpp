// Native host-side data plane for NLBAC-TPU.
//
// The device-side training path keeps replay on the TPU
// (nlbac_tpu/replay); this component serves the HOST-ENV mode
// (nlbac_tpu/envs/host_adapter.py), where an external physics engine
// (e.g. safe-control-gym's Quadrotor) steps on the host CPU and
// transitions/metrics flow through Python. It provides:
//
//   * RingBuffer  — a contiguous float32 transition store with O(1)
//     masked pushes and xorshift128+ uniform sampling into a caller
//     buffer (no per-record Python objects, no GC pressure).
//   * TsvWriter   — a buffered tab-separated metrics writer (the
//     progress.txt channel) with explicit flush control.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C runtime   (produces libnlbac_host.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct XorShift128Plus {
  uint64_t s0, s1;
  explicit XorShift128Plus(uint64_t seed) {
    // splitmix64 to spread the seed
    auto next = [&seed]() {
      uint64_t z = (seed += 0x9e3779b97f4a7c15ULL);
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      return z ^ (z >> 31);
    };
    s0 = next();
    s1 = next();
  }
  uint64_t next() {
    uint64_t x = s0;
    const uint64_t y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0, n)
  uint64_t bounded(uint64_t n) { return next() % n; }
};

struct RingBuffer {
  std::vector<float> data;
  int64_t capacity;
  int64_t record_size;
  int64_t position = 0;  // next write slot
  int64_t size = 0;      // valid records
  int64_t total = 0;     // pushes ever
  XorShift128Plus rng;

  RingBuffer(int64_t cap, int64_t rec, uint64_t seed)
      : data(static_cast<size_t>(cap) * rec), capacity(cap),
        record_size(rec), rng(seed) {}

  void push(const float* rec) {
    std::memcpy(&data[position * record_size], rec,
                record_size * sizeof(float));
    position = (position + 1) % capacity;
    size = std::min(size + 1, capacity);
    ++total;
  }

  // Uniform sample (with replacement) of `n` records into `out`
  // (n * record_size floats), bounded to the first min(size, max_index)
  // records — the host twin of nlbac_tpu.replay.sample.
  void sample(int64_t n, int64_t max_index, float* out) {
    int64_t hi = size;
    if (max_index > 0 && max_index < hi) hi = max_index;
    if (hi <= 0) {
      std::memset(out, 0, static_cast<size_t>(n) * record_size *
                              sizeof(float));
      return;
    }
    for (int64_t i = 0; i < n; ++i) {
      const int64_t idx = static_cast<int64_t>(rng.bounded(hi));
      std::memcpy(out + i * record_size, &data[idx * record_size],
                  record_size * sizeof(float));
    }
  }
};

struct TsvWriter {
  FILE* f;
  std::string buf;
  explicit TsvWriter(const char* path) : f(std::fopen(path, "w")) {
    buf.reserve(1 << 16);
  }
  ~TsvWriter() {
    if (f) {
      flush();
      std::fclose(f);
    }
  }
  // doubles, not floats: the Python backend formats host float64
  // metrics directly with %.6g, and the byte-identical contract
  // requires formatting the SAME double here (an f32 round-trip can
  // land on the other side of the 6th-significant-digit boundary).
  void row(const double* vals, int64_t n) {
    char tmp[32];
    for (int64_t i = 0; i < n; ++i) {
      int len = std::snprintf(tmp, sizeof(tmp), "%.6g", vals[i]);
      buf.append(tmp, len);
      buf.push_back(i + 1 < n ? '\t' : '\n');
    }
    if (buf.size() > (1 << 15)) flush();
  }
  void header(const char* line) {
    buf.append(line);
    buf.push_back('\n');
  }
  void flush() {
    if (f && !buf.empty()) {
      std::fwrite(buf.data(), 1, buf.size(), f);
      std::fflush(f);
      buf.clear();
    }
  }
};

}  // namespace

extern "C" {

void* rb_create(int64_t capacity, int64_t record_size, uint64_t seed) {
  return new RingBuffer(capacity, record_size, seed);
}
void rb_destroy(void* rb) { delete static_cast<RingBuffer*>(rb); }
void rb_push(void* rb, const float* rec) {
  static_cast<RingBuffer*>(rb)->push(rec);
}
void rb_push_many(void* rb, const float* recs, int64_t n) {
  auto* b = static_cast<RingBuffer*>(rb);
  for (int64_t i = 0; i < n; ++i) b->push(recs + i * b->record_size);
}
void rb_sample(void* rb, int64_t n, int64_t max_index, float* out) {
  static_cast<RingBuffer*>(rb)->sample(n, max_index, out);
}
int64_t rb_size(void* rb) { return static_cast<RingBuffer*>(rb)->size; }
int64_t rb_total(void* rb) { return static_cast<RingBuffer*>(rb)->total; }

// Snapshot/restore (host-loop checkpoint/resume, train/host_loop.py):
// the FULL ring contents plus counters and the sampler's RNG state, so
// a resumed run keeps both the data distribution and the sample stream.
// meta layout: [position, size, total, rng_s0, rng_s1] as uint64.
void rb_snapshot(void* rb, float* data_out, uint64_t* meta_out) {
  auto* b = static_cast<RingBuffer*>(rb);
  std::memcpy(data_out, b->data.data(), b->data.size() * sizeof(float));
  meta_out[0] = static_cast<uint64_t>(b->position);
  meta_out[1] = static_cast<uint64_t>(b->size);
  meta_out[2] = static_cast<uint64_t>(b->total);
  meta_out[3] = b->rng.s0;
  meta_out[4] = b->rng.s1;
}
void rb_restore(void* rb, const float* data, const uint64_t* meta) {
  auto* b = static_cast<RingBuffer*>(rb);
  std::memcpy(b->data.data(), data, b->data.size() * sizeof(float));
  b->position = static_cast<int64_t>(meta[0]);
  b->size = static_cast<int64_t>(meta[1]);
  b->total = static_cast<int64_t>(meta[2]);
  b->rng.s0 = meta[3];
  b->rng.s1 = meta[4];
}

void* tsv_create(const char* path) { return new TsvWriter(path); }
void tsv_destroy(void* w) { delete static_cast<TsvWriter*>(w); }
void tsv_header(void* w, const char* line) {
  static_cast<TsvWriter*>(w)->header(line);
}
void tsv_row(void* w, const double* vals, int64_t n) {
  static_cast<TsvWriter*>(w)->row(vals, n);
}
void tsv_flush(void* w) { static_cast<TsvWriter*>(w)->flush(); }

}  // extern "C"
