// MFCC front-end: pre-emphasis, Hamming window, FFT, mel filterbank,
// DCT-II, liftering, per-utterance CMVN, Δ and ΔΔ appending.
//
// Kaldi-style defaults (25 ms / 10 ms, 23 mel bins, 13 cepstra) — the
// native equivalent of the reference's kalpy MfccComputer usage
// (SURVEY.md §2.5/2.6). Output: 39-dim feature rows.
#pragma once

#include <cstddef>
#include <vector>

using std::size_t;

namespace efs2 {

struct MfccConfig {
  float frame_length_ms = 25.0f;
  float frame_shift_ms = 10.0f;
  int num_mel_bins = 23;
  int num_ceps = 13;
  float low_freq = 20.0f;
  float high_freq = 0.0f;  // 0 → Nyquist
  float preemph = 0.97f;
  float lifter = 22.0f;
  bool deltas = true;  // append Δ + ΔΔ → 39 dims
  bool cmvn = true;    // per-utterance mean/variance normalization
};

// frames x dim feature matrix, row-major.
struct FeatureMatrix {
  int rows = 0, cols = 0;
  std::vector<float> data;
  float* Row(int r) { return data.data() + size_t(r) * cols; }
  const float* Row(int r) const { return data.data() + size_t(r) * cols; }
};

// In-place radix-2 complex FFT (size must be a power of two).
void Fft(std::vector<float>& re, std::vector<float>& im);

void ComputeMfcc(const std::vector<float>& samples, int sample_rate,
                 const MfccConfig& cfg, FeatureMatrix* out);

}  // namespace efs2
