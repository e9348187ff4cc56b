// LDA estimation: within/between scatter from alignment classes, Cholesky
// whitening, cyclic-Jacobi symmetric eigensolver. See lda.h.

#include "lda.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <numeric>

namespace efs2 {

void LdaStats::Resize(int d, int nc) {
  dim = d;
  n_class = nc;
  count = 0;
  total_sum.assign(d, 0.0);
  total_sum2.assign(size_t(d) * d, 0.0);
  class_count.assign(nc, 0.0);
  class_sum.assign(size_t(nc) * d, 0.0);
}

void LdaStats::Merge(const LdaStats& o) {
  count += o.count;
  for (size_t i = 0; i < total_sum.size(); ++i) total_sum[i] += o.total_sum[i];
  for (size_t i = 0; i < total_sum2.size(); ++i)
    total_sum2[i] += o.total_sum2[i];
  for (size_t i = 0; i < class_count.size(); ++i)
    class_count[i] += o.class_count[i];
  for (size_t i = 0; i < class_sum.size(); ++i) class_sum[i] += o.class_sum[i];
}

void SpliceRow(const FeatureMatrix& feats, int t, const LdaOptions& opts,
               float* out) {
  int k = 0;
  for (int w = -opts.context; w <= opts.context; ++w) {
    int tt = std::min(std::max(t + w, 0), feats.rows - 1);
    const float* row = feats.Row(tt);
    for (int d = 0; d < opts.num_static; ++d) out[k++] = row[d];
  }
}

void LdaAccumulate(const float* x, int cls, LdaStats* s) {
  const int d = s->dim;
  s->count += 1;
  s->class_count[cls] += 1;
  double* cs = s->class_sum.data() + size_t(cls) * d;
  for (int i = 0; i < d; ++i) {
    s->total_sum[i] += x[i];
    cs[i] += x[i];
  }
  // Full symmetric scatter (upper triangle; mirrored at estimation time).
  for (int i = 0; i < d; ++i) {
    double* row = s->total_sum2.data() + size_t(i) * d;
    const double xi = x[i];
    for (int j = i; j < d; ++j) row[j] += xi * x[j];
  }
}

namespace {

// Cyclic Jacobi eigendecomposition of a symmetric matrix (row-major n x n).
// On return, a holds ~diagonal eigenvalues, v the column eigenvectors.
void JacobiEigen(std::vector<double>& a, int n, std::vector<double>& v) {
  v.assign(size_t(n) * n, 0.0);
  for (int i = 0; i < n; ++i) v[size_t(i) * n + i] = 1.0;
  auto A = [&](int i, int j) -> double& { return a[size_t(i) * n + j]; };
  auto V = [&](int i, int j) -> double& { return v[size_t(i) * n + j]; };
  for (int sweep = 0; sweep < 30; ++sweep) {
    double off = 0;
    for (int i = 0; i < n; ++i)
      for (int j = i + 1; j < n; ++j) off += A(i, j) * A(i, j);
    if (off < 1e-18) break;
    for (int p = 0; p < n - 1; ++p) {
      for (int q = p + 1; q < n; ++q) {
        double apq = A(p, q);
        if (std::fabs(apq) < 1e-30) continue;
        double app = A(p, p), aqq = A(q, q);
        double theta = 0.5 * (aqq - app) / apq;
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        double c = 1.0 / std::sqrt(t * t + 1.0), s = t * c;
        for (int k = 0; k < n; ++k) {
          double akp = A(k, p), akq = A(k, q);
          A(k, p) = c * akp - s * akq;
          A(k, q) = s * akp + c * akq;
        }
        for (int k = 0; k < n; ++k) {
          double apk = A(p, k), aqk = A(q, k);
          A(p, k) = c * apk - s * aqk;
          A(q, k) = s * apk + c * aqk;
        }
        for (int k = 0; k < n; ++k) {
          double vkp = V(k, p), vkq = V(k, q);
          V(k, p) = c * vkp - s * vkq;
          V(k, q) = s * vkp + c * vkq;
        }
      }
    }
  }
}

// Cholesky A = L L^T (lower). Returns false if not positive definite.
bool Cholesky(std::vector<double>& a, int n) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double sum = a[size_t(i) * n + j];
      for (int k = 0; k < j; ++k)
        sum -= a[size_t(i) * n + k] * a[size_t(j) * n + k];
      if (i == j) {
        if (sum <= 0) return false;
        a[size_t(i) * n + i] = std::sqrt(sum);
      } else {
        a[size_t(i) * n + j] = sum / a[size_t(j) * n + j];
      }
    }
    for (int j = i + 1; j < n; ++j) a[size_t(i) * n + j] = 0.0;
  }
  return true;
}

// Solve L y = b in place (forward substitution), L lower-triangular.
void ForwardSolve(const std::vector<double>& L, int n, double* b) {
  for (int i = 0; i < n; ++i) {
    double sum = b[i];
    for (int k = 0; k < i; ++k) sum -= L[size_t(i) * n + k] * b[k];
    b[i] = sum / L[size_t(i) * n + i];
  }
}

// Solve L^T y = b in place (back substitution).
void BackSolve(const std::vector<double>& L, int n, double* b) {
  for (int i = n - 1; i >= 0; --i) {
    double sum = b[i];
    for (int k = i + 1; k < n; ++k) sum -= L[size_t(k) * n + i] * b[k];
    b[i] = sum / L[size_t(i) * n + i];
  }
}

}  // namespace

std::vector<float> EstimateLda(const LdaStats& s, int target_dim) {
  const int d = s.dim;
  std::vector<float> proj(size_t(target_dim) * d, 0.0f);
  // Identity fallback: copy the leading target_dim spliced dims.
  for (int i = 0; i < target_dim && i < d; ++i) proj[size_t(i) * d + i] = 1.0f;
  if (s.count < 10 * d) return proj;

  // Global mean, total scatter T, within W = T - B', between B.
  std::vector<double> mean(d);
  for (int i = 0; i < d; ++i) mean[i] = s.total_sum[i] / s.count;
  std::vector<double> W(size_t(d) * d), B(size_t(d) * d, 0.0);
  for (int i = 0; i < d; ++i)
    for (int j = i; j < d; ++j) {
      double t = s.total_sum2[size_t(i) * d + j] / s.count - mean[i] * mean[j];
      W[size_t(i) * d + j] = W[size_t(j) * d + i] = t;
    }
  for (int c = 0; c < s.n_class; ++c) {
    double n = s.class_count[c];
    if (n < 1) continue;
    const double* cs = s.class_sum.data() + size_t(c) * d;
    for (int i = 0; i < d; ++i) {
      double di = cs[i] / n - mean[i];
      for (int j = i; j < d; ++j) {
        double dj = cs[j] / n - mean[j];
        B[size_t(i) * d + j] += (n / s.count) * di * dj;
      }
    }
  }
  for (int i = 0; i < d; ++i)
    for (int j = i + 1; j < d; ++j) B[size_t(j) * d + i] = B[size_t(i) * d + j];
  // W currently holds the total scatter; subtract between → within.
  for (size_t i = 0; i < W.size(); ++i) W[i] -= B[i];

  // Regularize W (smoothing toward its diagonal keeps Cholesky stable on
  // small corpora, same role as Kaldi's within-class smoothing).
  double tr = 0;
  for (int i = 0; i < d; ++i) tr += W[size_t(i) * d + i];
  double floor_eps = 1e-4 * std::max(tr / d, 1e-10);
  for (int i = 0; i < d; ++i) W[size_t(i) * d + i] += floor_eps;

  std::vector<double> L = W;
  if (!Cholesky(L, d)) return proj;

  // M = L^{-1} B L^{-T}: solve column-wise.
  std::vector<double> M(size_t(d) * d);
  std::vector<double> col(d);
  // First Y = L^{-1} B (apply forward solve to each column of B).
  std::vector<double> Y(size_t(d) * d);
  for (int j = 0; j < d; ++j) {
    for (int i = 0; i < d; ++i) col[i] = B[size_t(i) * d + j];
    ForwardSolve(L, d, col.data());
    for (int i = 0; i < d; ++i) Y[size_t(i) * d + j] = col[i];
  }
  // Then M = Y L^{-T}  ⇔  M^T = L^{-1} Y^T (forward solve rows of Y).
  for (int i = 0; i < d; ++i) {
    for (int j = 0; j < d; ++j) col[j] = Y[size_t(i) * d + j];
    ForwardSolve(L, d, col.data());
    for (int j = 0; j < d; ++j) M[size_t(i) * d + j] = col[j];
  }
  // Symmetrize against round-off.
  for (int i = 0; i < d; ++i)
    for (int j = i + 1; j < d; ++j) {
      double v = 0.5 * (M[size_t(i) * d + j] + M[size_t(j) * d + i]);
      M[size_t(i) * d + j] = M[size_t(j) * d + i] = v;
    }

  std::vector<double> evecs;
  JacobiEigen(M, d, evecs);
  std::vector<int> order(d);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return M[size_t(a) * d + a] > M[size_t(b) * d + b];
  });

  // Projection rows p_i = L^{-T} u_i: within-class covariance becomes I.
  for (int r = 0; r < target_dim && r < d; ++r) {
    int e = order[r];
    for (int i = 0; i < d; ++i) col[i] = evecs[size_t(i) * d + e];
    BackSolve(L, d, col.data());
    for (int i = 0; i < d; ++i) proj[size_t(r) * d + i] = float(col[i]);
  }
  return proj;
}

void LdaTransform(const FeatureMatrix& in, const std::vector<float>& proj,
                  const LdaOptions& opts, FeatureMatrix* out) {
  const int sd = opts.num_static * (2 * opts.context + 1);
  const int td = int(proj.size() / sd);
  out->rows = in.rows;
  out->cols = td;
  out->data.assign(size_t(in.rows) * td, 0.0f);
  std::vector<float> spliced(sd);
  for (int t = 0; t < in.rows; ++t) {
    SpliceRow(in, t, opts, spliced.data());
    float* o = out->Row(t);
    for (int r = 0; r < td; ++r) {
      const float* p = proj.data() + size_t(r) * sd;
      double acc = 0;
      for (int i = 0; i < sd; ++i) acc += double(p[i]) * spliced[i];
      o[r] = float(acc);
    }
  }
}

void WriteLda(std::FILE* f, const LdaOptions& opts,
              const std::vector<float>& proj) {
  int hdr[3] = {opts.context, opts.num_static, opts.target_dim};
  std::fwrite(hdr, sizeof(int), 3, f);
  int n = int(proj.size());
  std::fwrite(&n, sizeof(int), 1, f);
  std::fwrite(proj.data(), sizeof(float), proj.size(), f);
}

bool ReadLda(std::FILE* f, LdaOptions* opts, std::vector<float>* proj) {
  int hdr[3], n;
  if (std::fread(hdr, sizeof(int), 3, f) != 3) return false;
  if (std::fread(&n, sizeof(int), 1, f) != 1 || n <= 0 || n > (1 << 26))
    return false;
  opts->context = hdr[0];
  opts->num_static = hdr[1];
  opts->target_dim = hdr[2];
  proj->resize(n);
  return std::fread(proj->data(), sizeof(float), n, f) == size_t(n);
}

}  // namespace efs2
