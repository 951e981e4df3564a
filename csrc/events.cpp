// Native event-stream engine for benerf_tpu (host-side data path).
//
// TPU-native replacement for the reference's numba-JIT host kernels
// (/root/reference/utils/event_utils.py):
//   - accumulate_events  (event_utils.py:261-265): polarity scatter-add
//   - get_time_indices_offsets (event_utils.py:104-162): window index search
//   - plus the one-pass prepare (normalize + flatten + time-sort) feeding
//     benerf_tpu.data.events.prepare.
//
// Everything here is throughput-oriented host preprocessing: the training
// loop itself never calls back into this (ETA accumulation runs on-device as
// an XLA segment-sum); this engine exists for fast dataset ingest of
// multi-hundred-million-event streams (TUM-VIE h5 scale).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

extern "C" {

// out[y*width + x] += pol, sequential (deterministic; matches numba loop).
void accumulate_events(double* out, const int32_t* x, const int32_t* y,
                       const float* pol, int64_t n, int32_t width) {
  for (int64_t i = 0; i < n; ++i) {
    out[static_cast<int64_t>(y[i]) * width + x[i]] += pol[i];
  }
}

// Parallel deterministic scatter-add: each thread owns a slab of rows.
void accumulate_events_sharded(double* out, const int32_t* x, const int32_t* y,
                               const float* pol, int64_t n, int32_t width,
                               int32_t height, int32_t n_threads) {
  if (n_threads <= 1 || n < (1 << 16)) {
    accumulate_events(out, x, y, pol, n, width);
    return;
  }
  std::vector<std::thread> ts;
  int32_t rows_per = (height + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int32_t r0 = t * rows_per, r1 = std::min(height, r0 + rows_per);
    ts.emplace_back([=]() {
      for (int64_t i = 0; i < n; ++i) {
        int32_t yy = y[i];
        if (yy >= r0 && yy < r1)
          out[static_cast<int64_t>(yy) * width + x[i]] += pol[i];
      }
    });
  }
  for (auto& th : ts) th.join();
}

// searchsorted over a sorted time array: [lo, hi) covering t0 <= ts <= t1
// (inclusive ends, matching model/nerf.py:170-172 mask semantics).
void time_window(const float* ts, int64_t n, float t0, float t1, int64_t* lo,
                 int64_t* hi) {
  *lo = std::lower_bound(ts, ts + n, t0) - ts;
  *hi = std::upper_bound(ts, ts + n, t1) - ts;
}

// One-pass ingest: filter to [t_lo, t_hi], normalize time to [0,1] over that
// range, flatten pixels, stable-sort by raw timestamp. Two-phase API: call
// with pix_out == nullptr to get the kept-count, then again with buffers.
// Returns number of kept events.
int64_t prepare_events(const double* x, const double* y, const double* t,
                       const double* p, int64_t n, int32_t width, double t_lo,
                       double t_hi, int32_t* pix_out, float* ts_out,
                       float* pol_out) {
  std::vector<int64_t> keep;
  keep.reserve(n);
  for (int64_t i = 0; i < n; ++i) {
    if (t[i] >= t_lo && t[i] <= t_hi) keep.push_back(i);
  }
  if (pix_out == nullptr) return static_cast<int64_t>(keep.size());

  std::stable_sort(keep.begin(), keep.end(),
                   [&](int64_t a, int64_t b) { return t[a] < t[b]; });
  const double span = (t_hi > t_lo) ? (t_hi - t_lo) : 1.0;
  for (size_t j = 0; j < keep.size(); ++j) {
    int64_t i = keep[j];
    pix_out[j] = static_cast<int32_t>(y[i]) * width + static_cast<int32_t>(x[i]);
    ts_out[j] = static_cast<float>((t[i] - t_lo) / span);
    pol_out[j] = static_cast<float>(p[i]);
  }
  return static_cast<int64_t>(keep.size());
}

}  // extern "C"
