// Monotonic Alignment Search — C++ host kernel.
//
// Native parity oracle for the Pallas/scan implementations, matching the
// semantics of the reference Cython kernel
// (/root/reference/src/model/monotonic_align/core.pyx:9-45): banded forward
// max-accumulation over the (T_x, T_y) log-prior, then a backtrace emitting a
// 0/1 monotonic path. Batch-parallel with OpenMP; rows are written disjointly
// so no synchronization is needed.
//
// Built as a shared library at first use (see arttts_tpu/ops/mas_cpp.py) and
// called through ctypes — no pybind11 dependency.

#include <algorithm>
#include <cstdint>

extern "C" {

// paths:  int32 [B, T_x, T_y] zero-initialized output
// values: float [B, T_x, T_y] masked log-prior; mutated in place (DP table)
void mas_forward_backtrace(int32_t* paths, float* values, const int32_t* t_xs,
                           const int32_t* t_ys, int32_t B, int32_t T_x,
                           int32_t T_y, float max_neg_val) {
#pragma omp parallel for schedule(dynamic)
  for (int32_t b = 0; b < B; ++b) {
    float* v = values + static_cast<int64_t>(b) * T_x * T_y;
    int32_t* p = paths + static_cast<int64_t>(b) * T_x * T_y;
    const int32_t tx = t_xs[b];
    const int32_t ty = t_ys[b];

    for (int32_t y = 0; y < ty; ++y) {
      const int32_t x_lo = std::max(0, tx + y - ty);
      const int32_t x_hi = std::min(tx, y + 1);
      for (int32_t x = x_lo; x < x_hi; ++x) {
        const float v_cur = (x == y) ? max_neg_val : v[x * T_y + (y - 1)];
        float v_prev;
        if (x == 0) {
          v_prev = (y == 0) ? 0.0f : max_neg_val;
        } else {
          v_prev = v[(x - 1) * T_y + (y - 1)];
        }
        v[x * T_y + y] += std::max(v_cur, v_prev);
      }
    }

    int32_t index = tx - 1;
    for (int32_t y = ty - 1; y >= 0; --y) {
      p[index * T_y + y] = 1;
      if (index != 0 &&
          (index == y ||
           (y > 0 && v[index * T_y + (y - 1)] < v[(index - 1) * T_y + (y - 1)]))) {
        --index;
      }
    }
  }
}

}  // extern "C"
