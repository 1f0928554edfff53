// Native host-side data pipeline: fused gather+normalize and a threaded
// prefetch ring.
//
// The reference delegates host-side batching to torch's DataLoader, whose
// decode/collate/pin loop is C++ worker processes under the hood
// (src/data_utils.py:7-13).  This is the TPU-framework equivalent: the
// datasets are in-memory uint8 NHWC arrays (data/datasets.py), so the whole
// per-batch host cost is one gather + affine normalize — fused here into a
// single pass (numpy pays two passes plus a full-size temporary for
// `images[idx].astype(f32)`), and optionally run on a worker std::thread so
// the NEXT batch is assembled while the calling thread blocks on device
// dispatch (the axon tunnel's ~15-25 ms per dispatch is IO wait, which on
// the 1-core host is exactly the slack a second thread can use).
//
// Exact-parity contract: out = (float(v) / div) * mul + add, the same
// float32 op order as data/transforms.py scale_to_minus_one_one
// (div=255, mul=2, add=-1) and scale_to_zero_one (div=255, mul=1, add=0),
// so the native path is BITWISE equal to the numpy path (tests/test_native.py).
//
// Python binding is ctypes (ldm_tpu/native/__init__.py) — plain C ABI, no
// pybind11 dependency; build via ldm_tpu/native/build.py (g++ -O3 -shared).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// Fused gather + affine normalize: one pass, no temporaries.
//   images: n_items x item_elems uint8 (C-contiguous)
//   out:    n_idx x item_elems float32
void ldm_gather_affine_u8(const uint8_t* images, int64_t item_elems,
                          const int64_t* idx, int64_t n_idx,
                          float div, float mul, float add, float* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    const uint8_t* src = images + idx[i] * item_elems;
    float* dst = out + i * item_elems;
    for (int64_t j = 0; j < item_elems; ++j) {
      dst[j] = (static_cast<float>(src[j]) / div) * mul + add;
    }
  }
}

void ldm_gather_i32(const int32_t* labels, const int64_t* idx, int64_t n_idx,
                    int32_t* out) {
  for (int64_t i = 0; i < n_idx; ++i) out[i] = labels[idx[i]];
}

// ---------------------------------------------------------------- prefetcher
//
// One worker thread fills a ring of `capacity` batch slots from a per-epoch
// order array; the consumer copies slots out in order.  Single-producer,
// single-consumer, guarded by one mutex + two condition variables — the
// simplest correct shape (batches are ~ms-sized; lock overhead is noise).

namespace {

struct Slot {
  std::vector<float> img;
  std::vector<int32_t> lbl;
  bool full = false;
};

struct Prefetcher {
  const uint8_t* images;
  const int32_t* labels;
  int64_t item_elems;
  int64_t batch;
  float div, mul, add;

  std::vector<Slot> slots;
  std::vector<int64_t> order;  // owned copy of the epoch's index order
  int64_t n_batches = 0;       // in the current epoch
  int64_t produced = 0;        // batches filled by the worker
  int64_t consumed = 0;        // batches taken by the consumer

  std::mutex mu;
  std::condition_variable cv_worker;    // signals: new epoch / slot freed / stop
  std::condition_variable cv_consumer;  // signals: slot filled
  std::condition_variable cv_idle;      // signals: gather window closed
  bool stop = false;
  bool busy = false;      // worker is in its unlocked gather window
  int64_t epoch = 0;      // bumped by start_epoch; stale gathers are dropped
  std::thread worker;

  void run() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      cv_worker.wait(lk, [&] {
        return stop ||
               (produced < n_batches && !slots[produced % slots.size()].full);
      });
      if (stop) return;
      Slot& s = slots[produced % slots.size()];
      const int64_t* idx = order.data() + produced * batch;
      const int64_t my_epoch = epoch;
      busy = true;
      lk.unlock();  // the gather runs outside the lock
      ldm_gather_affine_u8(images, item_elems, idx, batch, div, mul, add,
                           s.img.data());
      ldm_gather_i32(labels, idx, batch, s.lbl.data());
      lk.lock();
      busy = false;
      cv_idle.notify_all();
      if (epoch != my_epoch) continue;  // epoch restarted mid-gather: drop it
      s.full = true;
      ++produced;
      cv_consumer.notify_one();
    }
  }
};

}  // namespace

void* ldm_prefetcher_create(const uint8_t* images, const int32_t* labels,
                            int64_t item_elems, int64_t batch,
                            float div, float mul, float add, int capacity) {
  auto* p = new Prefetcher();
  p->images = images;
  p->labels = labels;
  p->item_elems = item_elems;
  p->batch = batch;
  p->div = div;
  p->mul = mul;
  p->add = add;
  p->slots.resize(capacity > 0 ? capacity : 2);
  for (auto& s : p->slots) {
    s.img.resize(static_cast<size_t>(batch) * item_elems);
    s.lbl.resize(batch);
  }
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Begin an epoch over `n_order` indices (must be a multiple of the batch
// size; the Python side handles any tail batch itself).  The order array is
// copied, so the caller may free it immediately.  Safe to call with the
// previous epoch partially consumed (an abandoned iterator): the reset waits
// for the worker's gather window to close, so order.assign never races the
// in-flight reads, and the epoch bump drops a just-finished stale batch.
void ldm_prefetcher_start_epoch(void* h, const int64_t* order,
                                int64_t n_order) {
  auto* p = static_cast<Prefetcher*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_idle.wait(lk, [&] { return !p->busy; });
  ++p->epoch;
  p->order.assign(order, order + n_order);
  p->n_batches = n_order / p->batch;
  p->produced = 0;
  p->consumed = 0;
  for (auto& s : p->slots) s.full = false;
  p->cv_worker.notify_one();
}

// Copy the next batch into caller buffers.  Returns 1, or 0 at epoch end.
int ldm_prefetcher_next(void* h, float* out_img, int32_t* out_lbl) {
  auto* p = static_cast<Prefetcher*>(h);
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->consumed >= p->n_batches) return 0;
  Slot& s = p->slots[p->consumed % p->slots.size()];
  p->cv_consumer.wait(lk, [&] { return s.full; });
  std::memcpy(out_img, s.img.data(), s.img.size() * sizeof(float));
  std::memcpy(out_lbl, s.lbl.data(), s.lbl.size() * sizeof(int32_t));
  s.full = false;
  ++p->consumed;
  p->cv_worker.notify_one();
  return 1;
}

void ldm_prefetcher_destroy(void* h) {
  auto* p = static_cast<Prefetcher*>(h);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->cv_worker.notify_one();
  }
  p->worker.join();
  delete p;
}

}  // extern "C"
