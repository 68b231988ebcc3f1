// poreplex-tpu native signal-processing library.
//
// Host-side C++ implementations of the signal kernels, mirroring the roles
// of the reference's native layer (src/csupport.c + the vendored scrappie
// event detector, src/contrib/scrappie/event_detection.c). Used for:
//   * bit-parity validation of the TPU event-detection kernel
//     (double-precision prefix sums exactly like the original algorithm);
//   * fast host-side ingest transforms (stride pooling, pA conversion)
//     that overlap with device compute.
//
// Exposed via a plain C ABI consumed through ctypes (poreplex_tpu/native.py).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

#ifdef CHAOSMONKEY
// Fault-injection build, mirroring the reference's vendored testing aid
// (src/contrib/scrappie/scrappie_stdlib.h:10-27: -DCHAOSMONKEY=p makes
// allocations randomly fail with a warning). Here the global operator new
// throws bad_alloc with probability CHAOSMONKEY; the C-ABI entry points
// catch it and return the library's error sentinel (-1), so callers'
// failure paths are exercised instead of aborting the process. Not wired
// into the default build — `make chaos` produces the injected library.
#include <cstdio>
#include <cstdlib>
#include <new>

void* operator new(std::size_t size) {
  if (std::rand() < static_cast<double>(CHAOSMONKEY) * RAND_MAX) {
    std::fprintf(stderr,
                 "chaosmonkey: failing allocation of %zu bytes\n", size);
    throw std::bad_alloc();
  }
  void* ptr = std::malloc(size ? size : 1);
  if (ptr == nullptr) throw std::bad_alloc();
  return ptr;
}

void operator delete(void* ptr) noexcept { std::free(ptr); }
void operator delete(void* ptr, std::size_t) noexcept { std::free(ptr); }

#define PPTPU_TRY try {
#define PPTPU_CATCH(errval) \
  } catch (const std::bad_alloc&) { return (errval); }
#else
#define PPTPU_TRY
#define PPTPU_CATCH(errval)
#endif

namespace {

struct Detector {
  const float* signal;
  float threshold;
  std::size_t window_length;
  std::size_t masked_to = 0;
  std::ptrdiff_t peak_pos = -1;
  float peak_value = FLT_MAX;
  bool valid_peak = false;
};

void prefix_sums(const float* data, std::size_t n, std::vector<double>* sum,
                 std::vector<double>* sumsq) {
  sum->assign(n + 1, 0.0);
  sumsq->assign(n + 1, 0.0);
  for (std::size_t i = 0; i < n; ++i) {
    (*sum)[i + 1] = (*sum)[i] + data[i];
    // square in single precision before accumulating: the poreplex-vendored
    // scrappie kernel's `data[i] * data[i]` is a float product
    // (event_detection.c:47), and the short-event stdv is sensitive to it
    (*sumsq)[i + 1] = (*sumsq)[i] + data[i] * data[i];
  }
}

std::vector<float> windowed_tstat(const std::vector<double>& sum,
                                  const std::vector<double>& sumsq,
                                  std::size_t n, std::size_t w) {
  std::vector<float> tstat(n, 0.0f);
  if (n < 2 * w || w < 2) return tstat;

  const float wf = static_cast<float>(w);
  for (std::size_t i = w; i <= n - w; ++i) {
    double sum1 = sum[i];
    double sumsq1 = sumsq[i];
    if (i > w) {
      sum1 -= sum[i - w];
      sumsq1 -= sumsq[i - w];
    }
    const float sum2 = static_cast<float>(sum[i + w] - sum[i]);
    const float sumsq2 = static_cast<float>(sumsq[i + w] - sumsq[i]);
    const float mean1 = sum1 / wf;
    const float mean2 = sum2 / wf;
    float combined_var =
        sumsq1 / wf - mean1 * mean1 + sumsq2 / wf - mean2 * mean2;
    combined_var = std::max(combined_var, FLT_MIN);
    tstat[i] = std::fabs(mean2 - mean1) / std::sqrt(combined_var / wf);
  }
  return tstat;
}

// Dual short/long peak detector; emits peak positions in discovery order.
std::vector<std::size_t> dual_peak_detect(const std::vector<float>& tstat1,
                                          const std::vector<float>& tstat2,
                                          float thr1, float thr2,
                                          std::size_t w1, std::size_t w2,
                                          float peak_height) {
  Detector dets[2] = {{tstat1.data(), thr1, w1}, {tstat2.data(), thr2, w2}};
  std::vector<std::size_t> peaks;
  const std::size_t n = tstat1.size();

  for (std::size_t i = 0; i < n; ++i) {
    for (int k = 0; k < 2; ++k) {
      Detector& det = dets[k];
      if (det.masked_to >= i) continue;

      const float value = det.signal[i];
      if (det.peak_pos < 0) {
        if (value < det.peak_value) {
          det.peak_value = value;
        } else if (value - det.peak_value > peak_height) {
          det.peak_value = value;
          det.peak_pos = static_cast<std::ptrdiff_t>(i);
        }
        continue;
      }

      if (value > det.peak_value) {
        det.peak_value = value;
        det.peak_pos = static_cast<std::ptrdiff_t>(i);
      }
      if (k == 0 && det.peak_value > det.threshold) {
        // A confident short peak suppresses the long detector nearby.
        dets[1].masked_to = det.peak_pos + det.window_length;
        dets[1].peak_pos = -1;
        dets[1].peak_value = FLT_MAX;
        dets[1].valid_peak = false;
      }
      if (det.peak_value - value > peak_height &&
          det.peak_value > det.threshold) {
        det.valid_peak = true;
      }
      if (det.valid_peak &&
          i - det.peak_pos > det.window_length / 2) {
        peaks.push_back(static_cast<std::size_t>(det.peak_pos));
        det.peak_pos = -1;
        det.peak_value = value;
        det.valid_peak = false;
      }
    }
  }
  return peaks;
}

}  // namespace

extern "C" {

// Detect events in `signal[n]`. Writes up to `max_events` rows into the
// output arrays (start, length, mean, stdv) and returns the event count.
int64_t pptpu_detect_events(const float* signal, int64_t n,
                            int64_t window_length1, int64_t window_length2,
                            double threshold1, double threshold2,
                            double peak_height, int64_t max_events,
                            int64_t* ev_start, float* ev_length,
                            float* ev_mean, float* ev_stdv) {
  if (n <= 0) return 0;
  PPTPU_TRY
  std::vector<double> sum, sumsq;
  prefix_sums(signal, static_cast<std::size_t>(n), &sum, &sumsq);
  auto tstat1 = windowed_tstat(sum, sumsq, n, window_length1);
  auto tstat2 = windowed_tstat(sum, sumsq, n, window_length2);
  auto peaks = dual_peak_detect(tstat1, tstat2, threshold1, threshold2,
                                window_length1, window_length2, peak_height);

  std::vector<std::size_t> bounds;
  bounds.push_back(0);
  for (std::size_t p : peaks)
    if (p > 0 && p < static_cast<std::size_t>(n)) bounds.push_back(p);
  if (bounds.size() == 1) {
    // zero peaks: the vendored scrappie kernel emits one degenerate event
    // [0, 0) — length 0, mean 0/0 = NaN, stdv fmaxf(NaN, 0) = 0
    // (event_detection.c:246-261)
    ev_start[0] = 0;
    ev_length[0] = 0.0f;
    ev_mean[0] = std::numeric_limits<float>::quiet_NaN();
    ev_stdv[0] = 0.0f;
    return 1;
  }
  bounds.push_back(n);

  int64_t count = 0;
  for (std::size_t e = 0; e + 1 < bounds.size() && count < max_events; ++e) {
    const std::size_t start = bounds[e], end = bounds[e + 1];
    const float length = static_cast<float>(end - start);
    const float mean = static_cast<float>(sum[end] - sum[start]) / length;
    const float deltasqr = static_cast<float>(sumsq[end] - sumsq[start]);
    const float var = deltasqr / length - mean * mean;
    ev_start[count] = static_cast<int64_t>(start);
    ev_length[count] = length;
    ev_mean[count] = mean;
    ev_stdv[count] = std::sqrt(std::max(var, 0.0f));
    ++count;
  }
  return count;
  PPTPU_CATCH(static_cast<int64_t>(-1))
}

// Stride-mean pooling: out[i] = mean(signal[i*stride : (i+1)*stride]).
// Returns the pooled length (n / stride, truncated).
int64_t pptpu_pool_mean(const float* signal, int64_t n, int64_t stride,
                        float* out) {
  const int64_t m = n / stride;
  for (int64_t i = 0; i < m; ++i) {
    float acc = 0.0f;
    const float* chunk = signal + i * stride;
    for (int64_t k = 0; k < stride; ++k) acc += chunk[k];
    out[i] = acc / static_cast<float>(stride);
  }
  return m;
}

// Raw DAC to picoampere conversion: out = range/digitisation * (raw + offset)
// (semantics of poreplex/fast5_file.py:122-131).
void pptpu_to_pa(const int16_t* raw, int64_t n, double range,
                 double digitisation, double offset, float* out) {
  const double k = range / digitisation;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>(k * (raw[i] + offset));
  }
}

// Gaussian-mixture HMM Viterbi decode for one observation sequence.
// Emissions: per state, ncomp components with (mu, sigma, logweight) packed
// as [state*ncomp + c]. log_trans is row-major [from*nstates + to].
// Writes the decoded state path into path[n]. Returns the path log-prob.
// Serves as the optimized CPU baseline for the batched TPU Viterbi kernel
// (the reference used pomegranate's Cython Viterbi per read).
double pptpu_viterbi(const float* obs, int64_t n, int64_t nstates,
                     int64_t ncomp, const double* log_start,
                     const double* log_trans, const double* mus,
                     const double* sigmas, const double* logws,
                     int32_t* path) {
  if (n <= 0) return 0.0;
  PPTPU_TRY
  const double neg_inf = -1e300;
  const double log_2pi = std::log(2.0 * 3.14159265358979323846);

  std::vector<double> score(nstates), next(nstates);
  std::vector<int32_t> bp(static_cast<std::size_t>(n) * nstates);
  std::vector<double> emis(nstates);

  auto emit = [&](double x) {
    for (int64_t s = 0; s < nstates; ++s) {
      double best = neg_inf, acc = 0.0;
      // logsumexp over components (max-shifted)
      for (int64_t c = 0; c < ncomp; ++c) {
        const double lw = logws[s * ncomp + c];
        if (lw <= neg_inf) continue;
        const double z = (x - mus[s * ncomp + c]) / sigmas[s * ncomp + c];
        const double lp = lw - std::log(sigmas[s * ncomp + c]) -
                          0.5 * log_2pi - 0.5 * z * z;
        if (lp > best) best = lp;
      }
      if (best <= neg_inf) {
        emis[s] = neg_inf;
        continue;
      }
      for (int64_t c = 0; c < ncomp; ++c) {
        const double lw = logws[s * ncomp + c];
        if (lw <= neg_inf) continue;
        const double z = (x - mus[s * ncomp + c]) / sigmas[s * ncomp + c];
        const double lp = lw - std::log(sigmas[s * ncomp + c]) -
                          0.5 * log_2pi - 0.5 * z * z;
        acc += std::exp(lp - best);
      }
      emis[s] = best + std::log(acc);
    }
  };

  emit(obs[0]);
  for (int64_t s = 0; s < nstates; ++s) score[s] = log_start[s] + emis[s];

  for (int64_t t = 1; t < n; ++t) {
    emit(obs[t]);
    for (int64_t s = 0; s < nstates; ++s) {
      double best = neg_inf;
      int32_t arg = 0;
      for (int64_t p = 0; p < nstates; ++p) {
        const double cand = score[p] + log_trans[p * nstates + s];
        if (cand > best) {
          best = cand;
          arg = static_cast<int32_t>(p);
        }
      }
      next[s] = best + emis[s];
      bp[t * nstates + s] = arg;
    }
    score.swap(next);
  }

  double best = neg_inf;
  int32_t arg = 0;
  for (int64_t s = 0; s < nstates; ++s) {
    if (score[s] > best) {
      best = score[s];
      arg = static_cast<int32_t>(s);
    }
  }
  path[n - 1] = arg;
  for (int64_t t = n - 1; t > 0; --t) {
    path[t - 1] = bp[t * nstates + path[t]];
  }
  return best;
  PPTPU_CATCH(-std::numeric_limits<double>::infinity())
}

}  // extern "C"
