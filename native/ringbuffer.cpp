// Real-time audio transport for the streaming voice converter.
//
// The reference's live path is a Python sounddevice duplex callback that
// rolls numpy arrays inside the audio thread (evaluations/real-time-gui.py:
// 1316-1359) — allocation and GIL hazards in a hard-real-time context.  This
// native layer provides the TPU-serving equivalent: wait-free SPSC ring
// buffers (audio thread <-> compute thread) and a frame chunker, so the
// audio callback never blocks on Python and the compute thread consumes
// fixed 2048*k-sample chunks.
//
// Build: make -C native   (produces libsvan_rt.so; see bindings in
// streamvoiceanon_tpu/native/__init__.py)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Ring {
  float* data;
  uint64_t capacity;  // power of two
  alignas(64) std::atomic<uint64_t> head;  // written by producer
  alignas(64) std::atomic<uint64_t> tail;  // written by consumer
  // running totals for diagnostics
  alignas(64) std::atomic<uint64_t> overruns;
  std::atomic<uint64_t> underruns;
};

uint64_t next_pow2(uint64_t v) {
  uint64_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

}  // namespace

extern "C" {

// Creates a ring holding at least `min_capacity` float samples.
void* svan_ring_create(uint64_t min_capacity) {
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->capacity = next_pow2(min_capacity);
  r->data = new (std::nothrow) float[r->capacity];
  if (!r->data) {
    delete r;
    return nullptr;
  }
  std::memset(r->data, 0, r->capacity * sizeof(float));
  r->head.store(0, std::memory_order_relaxed);
  r->tail.store(0, std::memory_order_relaxed);
  r->overruns.store(0, std::memory_order_relaxed);
  r->underruns.store(0, std::memory_order_relaxed);
  return r;
}

void svan_ring_destroy(void* h) {
  Ring* r = static_cast<Ring*>(h);
  if (!r) return;
  delete[] r->data;
  delete r;
}

uint64_t svan_ring_capacity(void* h) { return static_cast<Ring*>(h)->capacity; }

// Samples available to read.
uint64_t svan_ring_available(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// Free space for writing.
uint64_t svan_ring_space(void* h) {
  Ring* r = static_cast<Ring*>(h);
  return r->capacity - svan_ring_available(h);
}

// Producer side (audio callback): copies n samples in.  If the ring is full
// the OLDEST samples are dropped (real-time semantics: latest audio wins),
// and the overrun counter is bumped.  Returns samples written.
uint64_t svan_ring_write(void* h, const float* src, uint64_t n) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  uint64_t space = r->capacity - (head - tail);
  if (n > r->capacity) {
    src += n - r->capacity;
    n = r->capacity;
  }
  if (n > space) {
    // drop oldest by advancing tail (consumer re-reads a coherent window)
    uint64_t drop = n - space;
    r->tail.store(tail + drop, std::memory_order_release);
    r->overruns.fetch_add(drop, std::memory_order_relaxed);
  }
  uint64_t mask = r->capacity - 1;
  for (uint64_t i = 0; i < n; ++i) r->data[(head + i) & mask] = src[i];
  r->head.store(head + n, std::memory_order_release);
  return n;
}

// Consumer side: copies exactly n samples out if available; otherwise fills
// with zeros (underrun) and returns the number of real samples delivered.
uint64_t svan_ring_read(void* h, float* dst, uint64_t n) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t take = avail < n ? avail : n;
  uint64_t mask = r->capacity - 1;
  for (uint64_t i = 0; i < take; ++i) dst[i] = r->data[(tail + i) & mask];
  for (uint64_t i = take; i < n; ++i) dst[i] = 0.0f;
  if (take < n) r->underruns.fetch_add(n - take, std::memory_order_relaxed);
  r->tail.store(tail + take, std::memory_order_release);
  return take;
}

// Peek without consuming (for rolling-window style access).
uint64_t svan_ring_peek(void* h, float* dst, uint64_t n) {
  Ring* r = static_cast<Ring*>(h);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t avail = head - tail;
  uint64_t take = avail < n ? avail : n;
  uint64_t mask = r->capacity - 1;
  uint64_t start = head - take;
  // deliver the most recent `take` samples right-aligned in dst
  for (uint64_t i = 0; i < n - take; ++i) dst[i] = 0.0f;
  for (uint64_t i = 0; i < take; ++i)
    dst[n - take + i] = r->data[(start + i) & mask];
  return take;
}

uint64_t svan_ring_overruns(void* h) {
  return static_cast<Ring*>(h)->overruns.load(std::memory_order_relaxed);
}

uint64_t svan_ring_underruns(void* h) {
  return static_cast<Ring*>(h)->underruns.load(std::memory_order_relaxed);
}

}  // extern "C"
