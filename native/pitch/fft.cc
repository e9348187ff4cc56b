#include "fft.h"

#include <cmath>

namespace efs2 {

void fft(std::vector<cd>& a, bool inverse) {
  const int n = static_cast<int>(a.size());
  // Bit-reversal permutation.
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  const double sign = inverse ? 1.0 : -1.0;
  // One direct-sincos twiddle table (smaller stages stride into it).
  // Direct evaluation instead of repeated multiplication: the latter
  // accumulates signal-correlated round-off that can leave a "ghost" of
  // the input in digitally silent regions.
  const double ang = sign * 2.0 * M_PI / n;
  std::vector<cd> wtab(std::max(n / 2, 1));
  for (int k = 0; k < n / 2; ++k)
    wtab[k] = cd(std::cos(ang * k), std::sin(ang * k));
  for (int len = 2; len <= n; len <<= 1) {
    const int stride = n / len;
    for (int i = 0; i < n; i += len) {
      for (int k = 0; k < len / 2; ++k) {
        cd u = a[i + k];
        cd v = a[i + k + len / 2] * wtab[k * stride];
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
      }
    }
  }
}

std::vector<cd> rfft_full(const double* x, int len, int n) {
  std::vector<cd> buf(n, cd(0.0, 0.0));
  for (int i = 0; i < len && i < n; ++i) buf[i] = cd(x[i], 0.0);
  fft(buf, false);
  return buf;
}

std::vector<cd> rfft_half(const double* x, int len, int n) {
  const int m = n / 2;
  if (m == 0) {
    return {cd(len > 0 ? x[0] : 0.0, 0.0)};
  }
  // Pack even/odd samples as real/imag of a length-m complex signal.
  std::vector<cd> z(m, cd(0.0, 0.0));
  for (int k = 0; 2 * k < len; ++k) {
    const double re = x[2 * k];
    const double im = (2 * k + 1 < len) ? x[2 * k + 1] : 0.0;
    z[k] = cd(re, im);
  }
  fft(z, false);
  std::vector<cd> out(m + 1);
  const double ang = -2.0 * M_PI / n;
  for (int k = 0; k <= m; ++k) {
    const cd zk = z[k % m];
    const cd zmk = std::conj(z[(m - k) % m]);
    const cd e = 0.5 * (zk + zmk);
    const cd o = cd(0.0, -0.5) * (zk - zmk);
    const cd w(std::cos(ang * k), std::sin(ang * k));
    out[k] = e + w * o;
  }
  return out;
}

std::vector<double> irfft_half(const std::vector<cd>& spec, int n) {
  const int m = n / 2;
  std::vector<double> y(n, 0.0);
  if (m == 0) {
    if (n == 1) y[0] = spec[0].real();
    return y;
  }
  std::vector<cd> z(m);
  const double ang = 2.0 * M_PI / n;
  for (int k = 0; k < m; ++k) {
    const cd xk = spec[k];
    const cd xmk = std::conj(spec[m - k]);
    const cd e = 0.5 * (xk + xmk);
    const cd w(std::cos(ang * k), std::sin(ang * k));
    const cd o = 0.5 * (xk - xmk) * w;
    z[k] = e + cd(0.0, 1.0) * o;
  }
  fft(z, true);
  const double scale = 1.0 / m;
  for (int k = 0; k < m; ++k) {
    y[2 * k] = z[k].real() * scale;
    y[2 * k + 1] = z[k].imag() * scale;
  }
  return y;
}

int next_pow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

}  // namespace efs2
