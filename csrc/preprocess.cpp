// Host-side preprocessing kernels for ragged irregular time series.
//
// Role: the reference treats interpolation-coefficient construction as
// offline preprocessing with per-scalar-path Python recursions
// (/root/reference/modules/torchcde/torchcde/interpolation_cubic.py:56-167,
// interpolation_linear.py:13-84) — minutes-slow on real datasets.  The
// TPU-side builders in ops/interpolation.py are fast for fixed shapes but
// ragged corpora (MIMIC) hit one XLA compile per distinct length.  This
// C++ library does the per-series work in a single pass per series with
// no compile step at all: the data loader calls it through ctypes
// (data/native.py) and falls back to the JAX path when unbuilt.
//
// All functions operate on contiguous float32 buffers, time-major
// (length, channels), NaN = missing.  They are independent per series and
// internally parallelised over series with std::thread.
//
// Build: data/native.py invokes
//   g++ -O3 -march=native -shared -fPIC -std=c++17 preprocess.cpp -o libncde_preprocess.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline bool is_nan(float v) { return std::isnan(v); }

// ---------------------------------------------------------------------------
// forward fill along time for one series
// ---------------------------------------------------------------------------
void forward_fill_one(float* x, int64_t length, int64_t channels) {
  for (int64_t c = 0; c < channels; ++c) {
    float last = std::nanf("");
    for (int64_t i = 0; i < length; ++i) {
      float& v = x[i * channels + c];
      if (is_nan(v)) {
        if (!is_nan(last)) v = last;
      } else {
        last = v;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// linear infill: interior NaNs interpolated, ends copied, all-NaN -> 0
// (semantics of interpolation_linear.py:13-84)
// ---------------------------------------------------------------------------
void linear_fill_one(float* x, const double* t, int64_t length, int64_t channels) {
  std::vector<int64_t> obs;
  obs.reserve(length);
  for (int64_t c = 0; c < channels; ++c) {
    obs.clear();
    for (int64_t i = 0; i < length; ++i)
      if (!is_nan(x[i * channels + c])) obs.push_back(i);
    if (obs.empty()) {
      for (int64_t i = 0; i < length; ++i) x[i * channels + c] = 0.0f;
      continue;
    }
    // leading / trailing copies
    for (int64_t i = 0; i < obs.front(); ++i)
      x[i * channels + c] = x[obs.front() * channels + c];
    for (int64_t i = obs.back() + 1; i < length; ++i)
      x[i * channels + c] = x[obs.back() * channels + c];
    // interior linear interpolation between consecutive observations
    for (size_t k = 0; k + 1 < obs.size(); ++k) {
      int64_t a = obs[k], b = obs[k + 1];
      if (b == a + 1) continue;
      double xa = x[a * channels + c], xb = x[b * channels + c];
      double ta = t[a], tb = t[b];
      for (int64_t i = a + 1; i < b; ++i) {
        double r = (t[i] - ta) / (tb - ta);
        x[i * channels + c] = static_cast<float>(xa + r * (xb - xa));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// rectilinear preparation: forward fill + interleave-lag -> (2L-1, C)
// (interpolation_linear.py:87-128)
// ---------------------------------------------------------------------------
void rectilinear_one(const float* x, float* out, int64_t length, int64_t channels,
                     int64_t time_index) {
  std::vector<float> filled(x, x + length * channels);
  forward_fill_one(filled.data(), length, channels);
  // out[i] takes values from row i/2 and the time entry from row (i+1)/2 —
  // the interleave-lag that turns linear interpolation into rectilinear.
  const int64_t out_len = 2 * length - 1;
  for (int64_t i = 0; i < out_len; ++i) {
    for (int64_t c = 0; c < channels; ++c) {
      out[i * channels + c] = filled[(i / 2) * channels + c];
    }
    out[i * channels + time_index] = filled[((i + 1) / 2) * channels + time_index];
  }
}

// ---------------------------------------------------------------------------
// natural cubic coefficients (derivative form, ends stabilised v1) for one
// scalar channel: compress observed knots, Thomas solve in double,
// re-expand onto the original grid (interpolation_cubic.py:78-167).
// Outputs a,b,two_c,three_d each (length-1) for this channel.
// ---------------------------------------------------------------------------
void natural_cubic_channel(const float* x, const double* t, int64_t length,
                           int64_t channels, int64_t c,
                           float* a_out, float* b_out, float* c2_out, float* d3_out) {
  std::vector<int64_t> obs;
  obs.reserve(length);
  for (int64_t i = 0; i < length; ++i)
    if (!is_nan(x[i * channels + c])) obs.push_back(i);

  const int64_t n_pieces = length - 1;
  if (obs.empty()) {
    for (int64_t i = 0; i < n_pieces; ++i)
      a_out[i] = b_out[i] = c2_out[i] = d3_out[i] = 0.0f;
    return;
  }

  // v1 end handling: every position before the first / after the last
  // observation becomes an observed constant knot.
  std::vector<double> ts, xs;
  ts.reserve(length);
  xs.reserve(length);
  const double x_first = x[obs.front() * channels + c];
  const double x_last = x[obs.back() * channels + c];
  for (int64_t i = 0; i < obs.front(); ++i) { ts.push_back(t[i]); xs.push_back(x_first); }
  for (int64_t i : obs) { ts.push_back(t[i]); xs.push_back(x[i * channels + c]); }
  for (int64_t i = obs.back() + 1; i < length; ++i) { ts.push_back(t[i]); xs.push_back(x_last); }
  const int64_t m = static_cast<int64_t>(ts.size());

  // Natural-spline tridiagonal system for knot derivatives.
  std::vector<double> diag(m, 0.0), off(m > 1 ? m - 1 : 0, 0.0), rhs(m, 0.0), k(m, 0.0);
  for (int64_t i = 0; i + 1 < m; ++i) {
    const double inv_h = 1.0 / (ts[i + 1] - ts[i]);
    const double piece = 3.0 * (xs[i + 1] - xs[i]) * inv_h * inv_h;
    off[i] = inv_h;
    diag[i] += 2.0 * inv_h;
    diag[i + 1] += 2.0 * inv_h;
    rhs[i] += piece;
    rhs[i + 1] += piece;
  }
  if (m == 1) {
    k[0] = 0.0;
  } else {
    // Thomas algorithm.
    std::vector<double> cp(m - 1), dp(m);
    cp[0] = off[0] / diag[0];
    dp[0] = rhs[0] / diag[0];
    for (int64_t i = 1; i < m; ++i) {
      const double denom = diag[i] - off[i - 1] * cp[i - 1];
      if (i < m - 1) cp[i] = off[i] / denom;
      dp[i] = (rhs[i] - off[i - 1] * dp[i - 1]) / denom;
    }
    k[m - 1] = dp[m - 1];
    for (int64_t i = m - 2; i >= 0; --i) k[i] = dp[i] - cp[i] * k[i + 1];
  }

  // Piece coefficients on the compressed pieces.
  std::vector<double> A(m > 1 ? m - 1 : 1, xs[0]), B(m > 1 ? m - 1 : 1, 0.0),
      C2(m > 1 ? m - 1 : 1, 0.0), D3(m > 1 ? m - 1 : 1, 0.0);
  for (int64_t i = 0; i + 1 < m; ++i) {
    const double inv_h = 1.0 / (ts[i + 1] - ts[i]);
    const double dx = xs[i + 1] - xs[i];
    A[i] = xs[i];
    B[i] = k[i];
    C2[i] = (6.0 * dx * inv_h - 4.0 * k[i] - 2.0 * k[i + 1]) * inv_h;
    D3[i] = (-6.0 * dx * inv_h + 3.0 * (k[i] + k[i + 1])) * inv_h * inv_h;
  }

  // Re-expand onto every original interval, re-centering at its left end.
  int64_t j = 0;
  for (int64_t i = 0; i < n_pieces; ++i) {
    const double tau = t[i];
    while (j + 2 < m && ts[j + 1] <= tau) ++j;
    const double off_t = ts[j] - tau;
    const double aa = A[j], bb = B[j], cc = C2[j], dd = D3[j];
    a_out[i] = static_cast<float>(aa + ((0.5 * cc - dd * off_t / 3.0) * off_t - bb) * off_t);
    b_out[i] = static_cast<float>(bb + (dd * off_t - cc) * off_t);
    c2_out[i] = static_cast<float>(cc - 2.0 * dd * off_t);
    d3_out[i] = static_cast<float>(dd);
  }
}

// ---------------------------------------------------------------------------
// Hermite cubic with backward differences — the causal cubic scheme
// (ops/interpolation.py::hermite_cubic_coefficients_with_backward_differences;
// behavioural spec: reference sim_bm_toy_example.py:164,189).  Linear NaN
// infill, then closed-form coefficients: on piece i the cubic matches
// x_i, x_{i+1} and the backward-difference derivatives d_i = m_{i-1}
// (d_0 = m_0), d_{i+1} = m_i.  No global solve — one pass per series.
// ---------------------------------------------------------------------------
void hermite_one(const float* x_in, const double* t, int64_t length,
                 int64_t channels, float* coeffs) {
  std::vector<float> x(x_in, x_in + length * channels);
  linear_fill_one(x.data(), t, length, channels);
  const int64_t n_pieces = length - 1;
  for (int64_t c = 0; c < channels; ++c) {
    double m_prev = 0.0;
    for (int64_t i = 0; i < n_pieces; ++i) {
      const double h = t[i + 1] - t[i];
      const double xi = x[i * channels + c];
      const double m = (x[(i + 1) * channels + c] - xi) / h;
      const double d0 = (i == 0) ? m : m_prev;
      const double d1 = m;
      float* row = coeffs + i * channels * 4;
      row[0 * channels + c] = static_cast<float>(xi);
      row[1 * channels + c] = static_cast<float>(d0);
      row[2 * channels + c] = static_cast<float>(2.0 * (3.0 * m - 2.0 * d0 - d1) / h);
      row[3 * channels + c] = static_cast<float>(3.0 * (d0 + d1 - 2.0 * m) / (h * h));
      m_prev = m;
    }
  }
}

void parallel_for(int64_t n, const std::function<void(int64_t)>& fn) {
  const int64_t hw = static_cast<int64_t>(std::thread::hardware_concurrency());
  const int64_t n_threads = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (n_threads == 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int64_t w = 0; w < n_threads; ++w) {
    threads.emplace_back([&, w]() {
      for (int64_t i = w; i < n; i += n_threads) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

#include <functional>

extern "C" {

// Batched entry points.  offsets: (n_series+1,) int64 row offsets into the
// concatenated (sum_lengths, channels) buffer — the natural layout for a
// ragged corpus.

void ncde_forward_fill(float* x, const int64_t* offsets, int64_t n_series,
                       int64_t channels) {
  parallel_for(n_series, [&](int64_t s) {
    forward_fill_one(x + offsets[s] * channels, offsets[s + 1] - offsets[s], channels);
  });
}

void ncde_linear_fill(float* x, const double* t, const int64_t* offsets,
                      int64_t n_series, int64_t channels) {
  parallel_for(n_series, [&](int64_t s) {
    linear_fill_one(x + offsets[s] * channels, t + offsets[s],
                    offsets[s + 1] - offsets[s], channels);
  });
}

// out buffer sized (2*sum_lengths - n_series, channels); out_offsets must
// hold 2*len_s - 1 cumulative rows.
void ncde_rectilinear(const float* x, float* out, const int64_t* offsets,
                      const int64_t* out_offsets, int64_t n_series,
                      int64_t channels, int64_t time_index) {
  parallel_for(n_series, [&](int64_t s) {
    rectilinear_one(x + offsets[s] * channels, out + out_offsets[s] * channels,
                    offsets[s + 1] - offsets[s], channels, time_index);
  });
}

// Natural cubic coefficients for a ragged batch: outputs are packed
// [a | b | two_c | three_d] on the channel axis, rows = sum(len_s - 1).
void ncde_natural_cubic(const float* x, const double* t, float* coeffs,
                        const int64_t* offsets, const int64_t* piece_offsets,
                        int64_t n_series, int64_t channels) {
  parallel_for(n_series * channels, [&](int64_t idx) {
    const int64_t s = idx / channels;
    const int64_t c = idx % channels;
    const int64_t length = offsets[s + 1] - offsets[s];
    const int64_t n_pieces = length - 1;
    if (n_pieces <= 0) return;
    std::vector<float> a(n_pieces), b(n_pieces), c2(n_pieces), d3(n_pieces);
    natural_cubic_channel(x + offsets[s] * channels, t + offsets[s], length,
                          channels, c, a.data(), b.data(), c2.data(), d3.data());
    float* row0 = coeffs + piece_offsets[s] * channels * 4;
    for (int64_t i = 0; i < n_pieces; ++i) {
      row0[i * channels * 4 + 0 * channels + c] = a[i];
      row0[i * channels * 4 + 1 * channels + c] = b[i];
      row0[i * channels * 4 + 2 * channels + c] = c2[i];
      row0[i * channels * 4 + 3 * channels + c] = d3[i];
    }
  });
}

// Hermite-cubic (backward differences) coefficients for a ragged batch:
// same packing as ncde_natural_cubic — [a | b | two_c | three_d] on the
// channel axis, rows = sum(len_s - 1).
void ncde_hermite(const float* x, const double* t, float* coeffs,
                  const int64_t* offsets, const int64_t* piece_offsets,
                  int64_t n_series, int64_t channels) {
  parallel_for(n_series, [&](int64_t s) {
    const int64_t length = offsets[s + 1] - offsets[s];
    if (length < 2) return;
    hermite_one(x + offsets[s] * channels, t + offsets[s], length, channels,
                coeffs + piece_offsets[s] * channels * 4);
  });
}

// GRU-D delta/mask: delta accumulates time since the channel was last
// observed (grud.py:186-210).  delta/mask buffers same ragged layout as x.
void ncde_delta_mask(const float* x, float* delta, float* mask,
                     const int64_t* offsets, int64_t n_series, int64_t channels) {
  parallel_for(n_series, [&](int64_t s) {
    const float* xs = x + offsets[s] * channels;
    float* ds = delta + offsets[s] * channels;
    float* ms = mask + offsets[s] * channels;
    const int64_t length = offsets[s + 1] - offsets[s];
    for (int64_t c = 0; c < channels; ++c) {
      for (int64_t i = 0; i < length; ++i) {
        ms[i * channels + c] = is_nan(xs[i * channels + c]) ? 0.0f : 1.0f;
      }
      ds[c] = 0.0f;
      for (int64_t i = 1; i < length; ++i) {
        const float dt = xs[i * channels + 0] - xs[(i - 1) * channels + 0];
        const float prev_mask = ms[(i - 1) * channels + c];
        ds[i * channels + c] = dt + ds[(i - 1) * channels + c] * (1.0f - prev_mask);
      }
    }
  });
}

}  // extern "C"
