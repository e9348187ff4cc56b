#include "pitch.h"

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstring>
#include <limits>
#include <map>
#include <mutex>
#include <thread>

#include "fft.h"

namespace efs2 {
namespace {

constexpr double kEps = 1e-12;

// Nuttall window (scipy.signal.windows.nuttall, symmetric), used to design
// the per-channel low-pass filters.
std::vector<double> nuttall(int n) {
  std::vector<double> w(n);
  if (n == 1) {
    w[0] = 1.0;
    return w;
  }
  const double a0 = 0.3635819, a1 = 0.4891775, a2 = 0.1365995,
               a3 = 0.0106411;
  for (int k = 0; k < n; ++k) {
    const double t = 2.0 * M_PI * k / (n - 1);
    w[k] = a0 - a1 * std::cos(t) + a2 * std::cos(2 * t) -
           a3 * std::cos(3 * t);
  }
  return w;
}

// FFT-based "same"-mode convolution of x with a centered FIR low-pass at
// `cutoff` Hz (sinc * Nuttall, normalized to unit DC gain). The signal
// spectrum is computed once by the caller and shared across channels.
struct SignalSpectrum {
  std::vector<cd> spec;  // rfft bins 0..nfft/2 of x zero-padded to nfft
  int n;                 // original length
  int nfft;
};

SignalSpectrum make_spectrum(const double* x, int n, int max_filter_len) {
  SignalSpectrum s;
  s.n = n;
  s.nfft = next_pow2(n + max_filter_len);
  s.spec = rfft_half(x, n, s.nfft);
  return s;
}

int filter_half(double fs, double cutoff) {
  return std::max(static_cast<int>(std::lround(fs / cutoff / 2.0)), 1);
}

std::vector<double> lowpass_taps(double fs, double cutoff) {
  const int half = filter_half(fs, cutoff);
  const int n = 4 * half + 1;
  std::vector<double> h(n);
  const std::vector<double> win = nuttall(n);
  const double fc = 2.0 * cutoff / fs;
  double sum = 0.0;
  for (int i = 0; i < n; ++i) {
    const double t = i - 2 * half;
    const double sinc = (t == 0.0) ? 1.0 : std::sin(M_PI * fc * t) /
                                              (M_PI * fc * t);
    h[i] = sinc * fc * win[i];
    sum += h[i];
  }
  for (double& v : h) v /= sum;
  return h;
}

// Filter spectra cache: a corpus run reuses the same (fs, cutoff) filters
// and utterance lengths quantize to a handful of nfft values.
struct FilterKey {
  int nfft;
  long long cutoff_u;  // cutoff in micro-Hz (exact for our derived cutoffs)
  bool operator<(const FilterKey& o) const {
    return nfft != o.nfft ? nfft < o.nfft : cutoff_u < o.cutoff_u;
  }
};

struct FilterSpec {
  std::vector<cd> spec;  // rfft bins of the taps, zero-padded to nfft
  int taps;
};

const FilterSpec& filter_spectrum(double fs, double cutoff, int nfft) {
  static std::mutex mu;
  static std::map<FilterKey, FilterSpec> cache;
  const FilterKey key{nfft,
                      static_cast<long long>(std::llround(cutoff * 1e6))};
  std::lock_guard<std::mutex> lock(mu);
  auto it = cache.find(key);
  if (it != cache.end()) return it->second;
  const std::vector<double> h = lowpass_taps(fs, cutoff);
  FilterSpec fsys;
  fsys.taps = static_cast<int>(h.size());
  fsys.spec = rfft_half(h.data(), fsys.taps, nfft);
  return cache.emplace(key, std::move(fsys)).first->second;
}

// y = lowpass(x) in "same" mode, via the shared signal spectrum.
std::vector<double> lowpass_apply(const SignalSpectrum& s, double fs,
                                  double cutoff) {
  const FilterSpec& f = filter_spectrum(fs, cutoff, s.nfft);
  std::vector<cd> prod(s.spec.size());
  for (size_t i = 0; i < prod.size(); ++i) prod[i] = s.spec[i] * f.spec[i];
  std::vector<double> full = irfft_half(prod, s.nfft);
  // full conv index offset: "same" keeps indices [(m-1)/2, (m-1)/2 + n).
  const int off = (f.taps - 1) / 2;
  std::vector<double> y(s.n);
  for (int i = 0; i < s.n; ++i) y[i] = full[i + off];
  return y;
}

// Event (zero-crossing) intervals: returns center times (s) and 1/interval
// F0 values for positive-going crossings of s (negate first for
// negative-going).
void event_intervals(const std::vector<double>& sig, double fs, bool negative,
                     std::vector<double>* centers, std::vector<double>* f0) {
  centers->clear();
  f0->clear();
  const int n = static_cast<int>(sig.size());
  // Gate FFT round-off in digitally silent regions: samples below a
  // relative floor are treated as exact zeros so silence yields no events
  // (matches dsp/pitch.py:_event_intervals).
  double peak = 0.0;
  for (double v : sig) peak = std::max(peak, std::fabs(v));
  const double gate = 1e-10 * peak;
  std::vector<double> times;
  for (int i = 0; i + 1 < n; ++i) {
    double a = negative ? -sig[i] : sig[i];
    double b = negative ? -sig[i + 1] : sig[i + 1];
    if (std::fabs(a) <= gate) a = 0.0;
    if (std::fabs(b) <= gate) b = 0.0;
    if (a < 0.0 && b >= 0.0) {
      const double frac = -a / (b - a);
      times.push_back((i + frac) / fs);
    }
  }
  if (times.size() < 3) return;
  for (size_t i = 0; i + 1 < times.size(); ++i) {
    const double dt = times[i + 1] - times[i];
    centers->push_back(0.5 * (times[i] + times[i + 1]));
    f0->push_back(dt > 0.0 ? 1.0 / dt : 0.0);
  }
}

// numpy.interp with left/right fill = 0.
std::vector<double> interp_frames(const std::vector<double>& frame_times,
                                  const std::vector<double>& xs,
                                  const std::vector<double>& ys) {
  std::vector<double> out(frame_times.size(), 0.0);
  if (xs.empty()) return out;
  for (size_t i = 0; i < frame_times.size(); ++i) {
    const double t = frame_times[i];
    if (t < xs.front() || t > xs.back()) {
      out[i] = 0.0;
      continue;
    }
    auto it = std::upper_bound(xs.begin(), xs.end(), t);
    if (it == xs.begin()) {
      out[i] = ys.front();
    } else if (it == xs.end()) {
      out[i] = ys.back();
    } else {
      const size_t hi = it - xs.begin();
      const size_t lo = hi - 1;
      const double w = (t - xs[lo]) / (xs[hi] - xs[lo] + kEps);
      out[i] = ys[lo] + w * (ys[hi] - ys[lo]);
    }
  }
  return out;
}

// One channel's candidate track: mean of the four interval estimators and a
// relative-deviation reliability score. Returns false if the channel is
// unusable (too few events).
bool candidate_track(const std::vector<double>& filtered, double fs,
                     const std::vector<double>& frame_times, double f0_floor,
                     double f0_ceil, std::vector<double>* cand,
                     std::vector<double>* dev) {
  const int n = static_cast<int>(filtered.size());
  // np.gradient: central differences, one-sided at the edges.
  std::vector<double> d(n);
  if (n >= 2) {
    d[0] = filtered[1] - filtered[0];
    d[n - 1] = filtered[n - 1] - filtered[n - 2];
    for (int i = 1; i + 1 < n; ++i)
      d[i] = 0.5 * (filtered[i + 1] - filtered[i - 1]);
  }
  const std::vector<double>* sigs[4] = {&filtered, &filtered, &d, &d};
  const bool neg[4] = {true, false, true, false};
  std::vector<std::vector<double>> tracks(4);
  std::vector<double> centers, f0s;
  for (int k = 0; k < 4; ++k) {
    event_intervals(*sigs[k], fs, neg[k], &centers, &f0s);
    if (centers.size() < 2) return false;
    tracks[k] = interp_frames(frame_times, centers, f0s);
  }
  const size_t nf = frame_times.size();
  cand->assign(nf, 0.0);
  dev->assign(nf, std::numeric_limits<double>::infinity());
  for (size_t i = 0; i < nf; ++i) {
    double mean = 0.0;
    bool nonpos = false;
    for (int k = 0; k < 4; ++k) {
      mean += tracks[k][i];
      nonpos |= tracks[k][i] <= 0.0;
    }
    mean *= 0.25;
    double var = 0.0;
    for (int k = 0; k < 4; ++k) {
      const double e = tracks[k][i] - mean;
      var += e * e;
    }
    var *= 0.25;
    const double sd = std::sqrt(var + kEps);
    if (mean < f0_floor || mean > f0_ceil || nonpos) {
      (*cand)[i] = 0.0;
      (*dev)[i] = std::numeric_limits<double>::infinity();
    } else {
      (*cand)[i] = mean;
      (*dev)[i] = sd / std::max(mean, 1e-6);
    }
  }
  return true;
}

}  // namespace

int num_frames(int n, int fs, double frame_period_ms) {
  return static_cast<int>(static_cast<double>(n) / fs * 1000.0 /
                          frame_period_ms) +
         1;
}

void dio(const double* x, int n, int fs, const PitchOptions& opt,
         std::vector<double>* f0_out, std::vector<double>* times_out) {
  const int nf = num_frames(n, fs, opt.frame_period_ms);
  std::vector<double>& f0 = *f0_out;
  std::vector<double>& frame_times = *times_out;
  frame_times.resize(nf);
  for (int i = 0; i < nf; ++i)
    frame_times[i] = i * opt.frame_period_ms / 1000.0;

  // Band-limit: keep [~f0_floor/2, 2*f0_ceil] (DC / rumble removal).
  const double lo_cut = std::max(opt.f0_floor * 0.5, 10.0);
  const int max_taps =
      4 * std::max(filter_half(fs, lo_cut),
                   filter_half(fs, opt.f0_ceil * 2.0)) +
      1;
  SignalSpectrum sx = make_spectrum(x, n, max_taps);
  std::vector<double> base = lowpass_apply(sx, fs, opt.f0_ceil * 2.0);
  SignalSpectrum sb = make_spectrum(base.data(), n, max_taps);
  std::vector<double> rumble = lowpass_apply(sb, fs, lo_cut);
  for (int i = 0; i < n; ++i) base[i] -= rumble[i];
  sb = make_spectrum(base.data(), n, max_taps);

  const int n_bands = static_cast<int>(std::ceil(
      std::log2(opt.f0_ceil / opt.f0_floor) * opt.channels_in_octave));

  std::vector<double> best_f0(nf, 0.0);
  std::vector<double> best_dev(nf, std::numeric_limits<double>::infinity());
  std::vector<std::vector<double>> cands(n_bands + 1), devs(n_bands + 1);
  std::vector<char> ok(n_bands + 1, 0);

  // Channels are independent: parallelize across hardware threads.
  const int n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> pool;
  std::atomic<int> next_band{0};
  auto worker = [&]() {
    for (;;) {
      const int i = next_band.fetch_add(1);
      if (i > n_bands) break;
      const double boundary =
          opt.f0_floor * std::pow(2.0, (i + 1) / opt.channels_in_octave);
      std::vector<double> filtered = lowpass_apply(sb, fs, boundary);
      ok[i] = candidate_track(filtered, fs, frame_times, opt.f0_floor,
                              opt.f0_ceil, &cands[i], &devs[i])
                  ? 1
                  : 0;
    }
  };
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  for (int i = 0; i <= n_bands; ++i) {
    if (!ok[i]) continue;
    for (int j = 0; j < nf; ++j) {
      if (devs[i][j] < best_dev[j]) {
        best_dev[j] = devs[i][j];
        best_f0[j] = cands[i][j];
      }
    }
  }

  f0.assign(nf, 0.0);
  for (int j = 0; j < nf; ++j)
    f0[j] = best_dev[j] < opt.allowed_range * 2.0 ? best_f0[j] : 0.0;

  // Contour fix: replace isolated outlier points that jump and return.
  for (int pass = 0; pass < 2; ++pass) {
    std::vector<double> fixed = f0;
    for (int j = 0; j < nf; ++j) {
      const double prev = (j > 0) ? f0[j - 1] : f0[0];
      const double nxt = (j + 1 < nf) ? f0[j + 1] : f0[nf - 1];
      const bool jump =
          f0[j] > 0.0 && prev > 0.0 &&
          std::fabs(f0[j] - prev) / std::max(f0[j], 1e-6) >
              opt.allowed_range * 2.0;
      if (jump && std::fabs(nxt - prev) / std::max(prev, 1e-6) <
                      opt.allowed_range) {
        fixed[j] = 0.5 * (prev + nxt);
      }
    }
    f0.swap(fixed);
  }
  // Remove voiced islands shorter than 3 frames.
  int start = -1;
  for (int j = 0; j <= nf; ++j) {
    const bool v = j < nf && f0[j] > 0.0;
    if (v && start < 0) start = j;
    if (!v && start >= 0) {
      if (j - start < 3)
        for (int k = start; k < j; ++k) f0[k] = 0.0;
      start = -1;
    }
  }
}

void stonemask(const double* x, int n, int fs,
               const std::vector<double>& times, std::vector<double>* f0_io) {
  std::vector<double>& refined = *f0_io;
  const int nf = static_cast<int>(refined.size());

  auto refine_frame = [&](int idx) {
    const double f = refined[idx];
    if (f <= 0.0) return;
    const int half = static_cast<int>(std::lround(1.5 * fs / f));
    const int c = static_cast<int>(std::lround(times[idx] * fs));
    const int lo = c - half, hi = c + half + 1;
    if (lo < 0 || hi + 1 > n) return;
    const int seg_len = hi - lo;
    // Blackman window (numpy.blackman).
    std::vector<double> sw(seg_len), sw1(seg_len);
    for (int i = 0; i < seg_len; ++i) {
      const double t = 2.0 * M_PI * i / (seg_len - 1);
      const double w = 0.42 - 0.5 * std::cos(t) + 0.08 * std::cos(2 * t);
      sw[i] = x[lo + i] * w;
      sw1[i] = x[lo + 1 + i] * w;
    }
    const int n_fft = next_pow2(seg_len * 2);
    std::vector<cd> spec = rfft_half(sw.data(), seg_len, n_fft);
    std::vector<cd> spec1 = rfft_half(sw1.data(), seg_len, n_fft);
    double num = 0.0, den = 0.0;
    const double bin_hz = static_cast<double>(fs) / n_fft;
    for (int k = 1; k < 7; ++k) {
      const double target = k * f;
      if (target > fs / 2.0 - 100.0) break;
      const int bi = static_cast<int>(std::lround(target / bin_hz));
      if (bi <= 0 || bi > n_fft / 2) continue;
      const cd s0 = spec[bi], s1 = spec1[bi];
      const double amp = std::abs(s0);
      // Instantaneous frequency from one-sample phase advance.
      const cd prod = s1 * std::conj(s0);
      const double inst = std::atan2(prod.imag(), prod.real()) * fs /
                          (2.0 * M_PI) / k;
      if (inst <= 0.0) continue;
      num += amp * inst;
      den += amp;
    }
    if (den > 0.0) {
      const double nf0 = num / den;
      if (nf0 > 0.5 * f && nf0 < 2.0 * f) refined[idx] = nf0;
    }
  };

  const int n_threads = std::max(1u, std::thread::hardware_concurrency());
  for (int it = 0; it < 2; ++it) {
    std::atomic<int> next_frame{0};
    std::vector<std::thread> pool;
    auto worker = [&]() {
      for (;;) {
        const int i = next_frame.fetch_add(1);
        if (i >= nf) break;
        refine_frame(i);
      }
    };
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
  }
}

}  // namespace efs2

extern "C" int efs2_estimate_f0(const double* x, int n, int fs,
                                double frame_period_ms, double f0_floor,
                                double f0_ceil, double* f0_out,
                                int capacity) {
  if (x == nullptr || f0_out == nullptr || n <= 0 || fs <= 0 ||
      frame_period_ms <= 0.0)
    return -1;
  efs2::PitchOptions opt;
  opt.frame_period_ms = frame_period_ms;
  opt.f0_floor = f0_floor;
  opt.f0_ceil = f0_ceil;
  const int nf = efs2::num_frames(n, fs, frame_period_ms);
  if (nf > capacity) return -1;
  std::vector<double> f0, times;
  efs2::dio(x, n, fs, opt, &f0, &times);
  efs2::stonemask(x, n, fs, times, &f0);
  std::memcpy(f0_out, f0.data(), sizeof(double) * nf);
  return nf;
}

// Debug/bisection exports (not part of the public API).
extern "C" int efs2_debug_lowpass(const double* x, int n, int fs,
                                  double cutoff, double* out) {
  efs2::SignalSpectrum s = efs2::make_spectrum(
      x, n, 4 * efs2::filter_half(fs, cutoff) + 1);
  std::vector<double> y = efs2::lowpass_apply(s, fs, cutoff);
  std::memcpy(out, y.data(), sizeof(double) * n);
  return n;
}

extern "C" int efs2_dio_only(const double* x, int n, int fs,
                             double frame_period_ms, double f0_floor,
                             double f0_ceil, double* f0_out, int capacity) {
  efs2::PitchOptions opt;
  opt.frame_period_ms = frame_period_ms;
  opt.f0_floor = f0_floor;
  opt.f0_ceil = f0_ceil;
  const int nf = efs2::num_frames(n, fs, frame_period_ms);
  if (nf > capacity) return -1;
  std::vector<double> f0, times;
  efs2::dio(x, n, fs, opt, &f0, &times);
  std::memcpy(f0_out, f0.data(), sizeof(double) * nf);
  return nf;
}
