// Minimal iterative radix-2 complex FFT used by the pitch extractor.
// Self-contained (no FFTW dependency); sizes are always powers of two.
#pragma once

#include <complex>
#include <vector>

namespace efs2 {

using cd = std::complex<double>;

// In-place FFT (inverse=false) / unnormalized inverse FFT (inverse=true)
// over a power-of-two-sized buffer.
void fft(std::vector<cd>& a, bool inverse);

// Real-input FFT convenience: returns the full complex spectrum of x
// zero-padded to n (n must be a power of two).
std::vector<cd> rfft_full(const double* x, int len, int n);

// Real FFT via a half-size complex transform: returns bins 0..n/2
// (n/2 + 1 values) of the length-n spectrum of x zero-padded to n.
std::vector<cd> rfft_half(const double* x, int len, int n);

// Inverse of rfft_half for a conjugate-symmetric spectrum: takes bins
// 0..n/2 and returns the length-n real signal (normalized).
std::vector<double> irfft_half(const std::vector<cd>& spec, int n);

// Smallest power of two >= n.
int next_pow2(int n);

}  // namespace efs2
