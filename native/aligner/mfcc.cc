#include "mfcc.h"

#include <cmath>
#include <cstring>

namespace efs2 {

namespace {
constexpr float kPi = 3.14159265358979323846f;

float HzToMel(float hz) { return 1127.0f * std::log1p(hz / 700.0f); }
float MelToHz(float mel) { return 700.0f * (std::exp(mel / 1127.0f) - 1.0f); }

int NextPow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}
}  // namespace

void Fft(std::vector<float>& re, std::vector<float>& im) {
  const int n = int(re.size());
  // Bit reversal.
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    float ang = -2.0f * kPi / float(len);
    float wr = std::cos(ang), wi = std::sin(ang);
    for (int i = 0; i < n; i += len) {
      float cur_r = 1.0f, cur_i = 0.0f;
      for (int k = 0; k < len / 2; ++k) {
        float ur = re[i + k], ui = im[i + k];
        float vr = re[i + k + len / 2] * cur_r - im[i + k + len / 2] * cur_i;
        float vi = re[i + k + len / 2] * cur_i + im[i + k + len / 2] * cur_r;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        float nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

void ComputeMfcc(const std::vector<float>& samples, int sample_rate,
                 const MfccConfig& cfg, FeatureMatrix* out) {
  const int frame_len = int(cfg.frame_length_ms * sample_rate / 1000.0f);
  const int frame_shift = int(cfg.frame_shift_ms * sample_rate / 1000.0f);
  const int n_fft = NextPow2(frame_len);
  const int n_bins = n_fft / 2 + 1;
  const int n_frames =
      samples.size() < size_t(frame_len)
          ? 0
          : 1 + int((samples.size() - frame_len) / frame_shift);

  // Hamming window.
  std::vector<float> window(frame_len);
  for (int i = 0; i < frame_len; ++i)
    window[i] = 0.54f - 0.46f * std::cos(2.0f * kPi * i / (frame_len - 1));

  // Mel filterbank (triangular, HTK mel scale).
  const float high = cfg.high_freq > 0 ? cfg.high_freq : sample_rate / 2.0f;
  const int m = cfg.num_mel_bins;
  std::vector<float> centers(m + 2);
  {
    float mel_lo = HzToMel(cfg.low_freq), mel_hi = HzToMel(high);
    for (int i = 0; i < m + 2; ++i)
      centers[i] = MelToHz(mel_lo + (mel_hi - mel_lo) * i / (m + 1));
  }
  // filter weights per (mel bin, fft bin)
  std::vector<float> fb(size_t(m) * n_bins, 0.0f);
  for (int b = 0; b < m; ++b) {
    float l = centers[b], c = centers[b + 1], r = centers[b + 2];
    for (int k = 0; k < n_bins; ++k) {
      float hz = float(k) * sample_rate / n_fft;
      float w = 0.0f;
      if (hz > l && hz < c)
        w = (hz - l) / (c - l);
      else if (hz >= c && hz < r)
        w = (r - hz) / (r - c);
      fb[size_t(b) * n_bins + k] = w;
    }
  }

  // DCT-II matrix (orthonormal-ish, HTK scaling) + lifter.
  const int nc = cfg.num_ceps;
  std::vector<float> dct(size_t(nc) * m);
  for (int i = 0; i < nc; ++i)
    for (int j = 0; j < m; ++j)
      dct[size_t(i) * m + j] =
          std::sqrt(2.0f / m) * std::cos(kPi * i * (j + 0.5f) / m);
  std::vector<float> lifter(nc, 1.0f);
  if (cfg.lifter > 0)
    for (int i = 0; i < nc; ++i)
      lifter[i] = 1.0f + 0.5f * cfg.lifter * std::sin(kPi * i / cfg.lifter);

  FeatureMatrix ceps;
  ceps.rows = n_frames;
  ceps.cols = nc;
  ceps.data.assign(size_t(n_frames) * nc, 0.0f);

  std::vector<float> re(n_fft), im(n_fft), mel(m);
  for (int t = 0; t < n_frames; ++t) {
    const float* frame = samples.data() + size_t(t) * frame_shift;
    // Pre-emphasis + window.
    for (int i = 0; i < frame_len; ++i) {
      float prev = (i == 0) ? (t == 0 ? frame[0] : frame[-1]) : frame[i - 1];
      re[i] = (frame[i] - cfg.preemph * prev) * window[i];
    }
    std::fill(re.begin() + frame_len, re.end(), 0.0f);
    std::fill(im.begin(), im.end(), 0.0f);
    Fft(re, im);
    // Power spectrum → mel energies → log.
    for (int b = 0; b < m; ++b) {
      double acc = 0.0;
      const float* w = &fb[size_t(b) * n_bins];
      for (int k = 0; k < n_bins; ++k) {
        float p = re[k] * re[k] + im[k] * im[k];
        acc += w[k] * p;
      }
      mel[b] = std::log(std::max(float(acc), 1e-10f));
    }
    float* row = ceps.Row(t);
    for (int i = 0; i < nc; ++i) {
      double acc = 0.0;
      for (int j = 0; j < m; ++j) acc += dct[size_t(i) * m + j] * mel[j];
      row[i] = float(acc) * lifter[i];
    }
  }

  if (cfg.cmvn && n_frames > 0) {
    for (int c = 0; c < nc; ++c) {
      double mean = 0, var = 0;
      for (int t = 0; t < n_frames; ++t) mean += ceps.Row(t)[c];
      mean /= n_frames;
      for (int t = 0; t < n_frames; ++t) {
        double d = ceps.Row(t)[c] - mean;
        var += d * d;
      }
      var = std::sqrt(var / n_frames + 1e-8);
      for (int t = 0; t < n_frames; ++t)
        ceps.Row(t)[c] = float((ceps.Row(t)[c] - mean) / var);
    }
  }

  if (!cfg.deltas) {
    *out = std::move(ceps);
    return;
  }
  // Δ and ΔΔ with +-2 window (Kaldi regression formula, denom 10).
  out->rows = n_frames;
  out->cols = nc * 3;
  out->data.assign(size_t(n_frames) * nc * 3, 0.0f);
  auto clampt = [&](int t) { return t < 0 ? 0 : (t >= n_frames ? n_frames - 1 : t); };
  std::vector<float> delta(size_t(n_frames) * nc);
  for (int t = 0; t < n_frames; ++t)
    for (int c = 0; c < nc; ++c) {
      float d = 0;
      for (int w = 1; w <= 2; ++w)
        d += w * (ceps.Row(clampt(t + w))[c] - ceps.Row(clampt(t - w))[c]);
      delta[size_t(t) * nc + c] = d / 10.0f;
    }
  for (int t = 0; t < n_frames; ++t) {
    float* row = out->Row(t);
    std::memcpy(row, ceps.Row(t), nc * sizeof(float));
    std::memcpy(row + nc, &delta[size_t(t) * nc], nc * sizeof(float));
    for (int c = 0; c < nc; ++c) {
      float dd = 0;
      for (int w = 1; w <= 2; ++w)
        dd += w * (delta[size_t(clampt(t + w)) * nc + c] -
                   delta[size_t(clampt(t - w)) * nc + c]);
      row[2 * nc + c] = dd / 10.0f;
    }
  }
}

}  // namespace efs2
