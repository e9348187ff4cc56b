#include "gmm.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>

namespace efs2 {

namespace {
constexpr float kLog2Pi = 1.8378770664093453f;

float LogSumExp(const std::vector<float>& v) {
  float m = v[0];
  for (float x : v) m = std::max(m, x);
  double s = 0;
  for (float x : v) s += std::exp(x - m);
  return m + float(std::log(s));
}
}  // namespace

void DiagGmm::Init(int d, const float* mean, const float* var) {
  dim = d;
  weights = {1.0f};
  means.assign(mean, mean + d);
  inv_vars.resize(d);
  for (int i = 0; i < d; ++i) inv_vars[i] = 1.0f / std::max(var[i], 1e-4f);
  ComputeGconsts();
}

void DiagGmm::ComputeGconsts() {
  const int nc = NumComps();
  gconsts.resize(nc);
  for (int c = 0; c < nc; ++c) {
    double log_det = 0;
    for (int d = 0; d < dim; ++d)
      log_det -= std::log(double(inv_vars[size_t(c) * dim + d]));
    gconsts[c] = std::log(std::max(weights[c], 1e-10f)) -
                 0.5f * (dim * kLog2Pi + float(log_det));
  }
}

float DiagGmm::LogLikelihood(const float* x) const {
  const int nc = NumComps();
  float best = -1e30f;
  std::vector<float> ll(nc);
  for (int c = 0; c < nc; ++c) {
    const float* mu = &means[size_t(c) * dim];
    const float* iv = &inv_vars[size_t(c) * dim];
    float acc = gconsts[c];
    for (int d = 0; d < dim; ++d) {
      float diff = x[d] - mu[d];
      acc -= 0.5f * diff * diff * iv[d];
    }
    ll[c] = acc;
    best = std::max(best, acc);
  }
  if (nc == 1) return ll[0];
  double s = 0;
  for (float v : ll) s += std::exp(v - best);
  return best + float(std::log(s));
}

float DiagGmm::ComponentPosteriors(const float* x,
                                   std::vector<float>* post) const {
  const int nc = NumComps();
  post->resize(nc);
  for (int c = 0; c < nc; ++c) {
    const float* mu = &means[size_t(c) * dim];
    const float* iv = &inv_vars[size_t(c) * dim];
    float acc = gconsts[c];
    for (int d = 0; d < dim; ++d) {
      float diff = x[d] - mu[d];
      acc -= 0.5f * diff * diff * iv[d];
    }
    (*post)[c] = acc;
  }
  float total = LogSumExp(*post);
  for (int c = 0; c < nc; ++c) (*post)[c] = std::exp((*post)[c] - total);
  return total;
}

void DiagGmm::Split() {
  const int nc = NumComps();
  weights.resize(2 * nc);
  means.resize(size_t(2 * nc) * dim);
  inv_vars.resize(size_t(2 * nc) * dim);
  for (int c = 0; c < nc; ++c) {
    weights[c] *= 0.5f;
    weights[nc + c] = weights[c];
    for (int d = 0; d < dim; ++d) {
      float sigma = 1.0f / std::sqrt(inv_vars[size_t(c) * dim + d]);
      float mu = means[size_t(c) * dim + d];
      means[size_t(nc + c) * dim + d] = mu - 0.2f * sigma;
      means[size_t(c) * dim + d] = mu + 0.2f * sigma;
      inv_vars[size_t(nc + c) * dim + d] = inv_vars[size_t(c) * dim + d];
    }
  }
  ComputeGconsts();
}

void GmmAccumulator::Resize(int nc, int d) {
  dim = d;
  num_comps = nc;
  occ.assign(nc, 0.0);
  sum_x.assign(size_t(nc) * d, 0.0);
  sum_x2.assign(size_t(nc) * d, 0.0);
}

void GmmAccumulator::Add(const DiagGmm& gmm, const float* x, float weight) {
  std::vector<float> post;
  gmm.ComponentPosteriors(x, &post);
  for (int c = 0; c < num_comps; ++c) {
    double w = double(post[c]) * weight;
    if (w < 1e-8) continue;
    occ[c] += w;
    double* sx = &sum_x[size_t(c) * dim];
    double* sx2 = &sum_x2[size_t(c) * dim];
    for (int d = 0; d < dim; ++d) {
      sx[d] += w * x[d];
      sx2[d] += w * double(x[d]) * x[d];
    }
  }
}

void GmmAccumulator::Merge(const GmmAccumulator& other) {
  for (size_t i = 0; i < occ.size(); ++i) occ[i] += other.occ[i];
  for (size_t i = 0; i < sum_x.size(); ++i) {
    sum_x[i] += other.sum_x[i];
    sum_x2[i] += other.sum_x2[i];
  }
}

void UpdateGmm(const GmmAccumulator& acc, float var_floor, DiagGmm* gmm) {
  double total = 0;
  for (double o : acc.occ) total += o;
  if (total < 1.0) return;  // too little data; keep previous params
  for (int c = 0; c < acc.num_comps; ++c) {
    if (acc.occ[c] < 1.0) continue;  // starved component: keep
    gmm->weights[c] = float(acc.occ[c] / total);
    for (int d = 0; d < acc.dim; ++d) {
      double mu = acc.sum_x[size_t(c) * acc.dim + d] / acc.occ[c];
      double var =
          acc.sum_x2[size_t(c) * acc.dim + d] / acc.occ[c] - mu * mu;
      gmm->means[size_t(c) * acc.dim + d] = float(mu);
      gmm->inv_vars[size_t(c) * acc.dim + d] =
          1.0f / std::max(float(var), var_floor);
    }
  }
  gmm->ComputeGconsts();
}

void WriteGmms(const std::string& path,
               const std::vector<std::string>& phones,
               const std::vector<DiagGmm>& gmms) {
  FILE* f = std::fopen(path.c_str(), "wb");
  if (!f) return;
  uint32_t n_ph = phones.size(), n_g = gmms.size();
  std::fwrite("EFS2AM01", 1, 8, f);
  std::fwrite(&n_ph, 4, 1, f);
  for (const auto& p : phones) {
    uint32_t len = p.size();
    std::fwrite(&len, 4, 1, f);
    std::fwrite(p.data(), 1, len, f);
  }
  std::fwrite(&n_g, 4, 1, f);
  for (const auto& g : gmms) {
    uint32_t dim = g.dim, nc = g.NumComps();
    std::fwrite(&dim, 4, 1, f);
    std::fwrite(&nc, 4, 1, f);
    std::fwrite(g.weights.data(), 4, nc, f);
    std::fwrite(g.means.data(), 4, size_t(nc) * dim, f);
    std::fwrite(g.inv_vars.data(), 4, size_t(nc) * dim, f);
  }
  std::fclose(f);
}

bool ReadGmms(const std::string& path, std::vector<std::string>* phones,
              std::vector<DiagGmm>* gmms) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "EFS2AM01", 8)) {
    std::fclose(f);
    return false;
  }
  uint32_t n_ph = 0;
  if (std::fread(&n_ph, 4, 1, f) != 1) { std::fclose(f); return false; }
  phones->resize(n_ph);
  for (auto& p : *phones) {
    uint32_t len = 0;
    if (std::fread(&len, 4, 1, f) != 1) { std::fclose(f); return false; }
    p.resize(len);
    if (len && std::fread(p.data(), 1, len, f) != len) {
      std::fclose(f);
      return false;
    }
  }
  uint32_t n_g = 0;
  if (std::fread(&n_g, 4, 1, f) != 1) { std::fclose(f); return false; }
  gmms->resize(n_g);
  for (auto& g : *gmms) {
    uint32_t dim = 0, nc = 0;
    if (std::fread(&dim, 4, 1, f) != 1 || std::fread(&nc, 4, 1, f) != 1) {
      std::fclose(f);
      return false;
    }
    g.dim = dim;
    g.weights.resize(nc);
    g.means.resize(size_t(nc) * dim);
    g.inv_vars.resize(size_t(nc) * dim);
    bool ok = std::fread(g.weights.data(), 4, nc, f) == nc &&
              std::fread(g.means.data(), 4, size_t(nc) * dim, f) ==
                  size_t(nc) * dim &&
              std::fread(g.inv_vars.data(), 4, size_t(nc) * dim, f) ==
                  size_t(nc) * dim;
    if (!ok) { std::fclose(f); return false; }
    g.ComputeGconsts();
  }
  std::fclose(f);
  return true;
}


// --- Diagonal fMLLR ---

void FmllrAccumulator::Resize(int d) {
  dim = d;
  beta = 0.0;
  g00.assign(d, 0.0);
  g01.assign(d, 0.0);
  g11.assign(d, 0.0);
  k0.assign(d, 0.0);
  k1.assign(d, 0.0);
}

void FmllrAccumulator::Add(const DiagGmm& gmm, const float* x) {
  std::vector<float> post;
  // ComponentPosteriors already returns normalized probabilities in [0,1]
  // (it log-sum-exps and exponentiates internally); consume them directly
  // as gammas, exactly like GmmAccumulator::Add above.
  gmm.ComponentPosteriors(x, &post);
  const int nc = gmm.NumComps();
  for (int c = 0; c < nc; ++c) {
    const double gamma = post[c];
    if (gamma < 1e-6) continue;
    const float* mu = &gmm.means[size_t(c) * dim];
    const float* iv = &gmm.inv_vars[size_t(c) * dim];
    for (int d = 0; d < dim; ++d) {
      const double giv = gamma * iv[d];
      g00[d] += giv * x[d] * x[d];
      g01[d] += giv * x[d];
      g11[d] += giv;
      k0[d] += giv * mu[d] * x[d];
      k1[d] += giv * mu[d];
    }
  }
  beta += 1.0;
}

void FmllrAccumulator::Merge(const FmllrAccumulator& other) {
  if (dim == 0) Resize(other.dim);
  beta += other.beta;
  for (int d = 0; d < dim; ++d) {
    g00[d] += other.g00[d];
    g01[d] += other.g01[d];
    g11[d] += other.g11[d];
    k0[d] += other.k0[d];
    k1[d] += other.k1[d];
  }
}

DiagTransform EstimateDiagFmllr(const FmllrAccumulator& acc,
                                double min_count) {
  DiagTransform t;
  t.scale.assign(acc.dim, 1.0f);
  t.offset.assign(acc.dim, 0.0f);
  if (acc.beta < min_count) return t;
  for (int d = 0; d < acc.dim; ++d) {
    const double G00 = acc.g00[d], G01 = acc.g01[d], G11 = acc.g11[d];
    const double K0 = acc.k0[d], K1 = acc.k1[d];
    if (G11 < 1e-6) continue;
    // Maximize beta*log(a) - 0.5 w'Gw + k'w; b = (K1 - G01*a)/G11,
    // then c2*a^2 - c1*a - beta = 0 with the positive root.
    const double c2 = G00 - G01 * G01 / G11;
    const double c1 = K0 - G01 * K1 / G11;
    if (c2 < 1e-8) continue;
    const double disc = c1 * c1 + 4.0 * c2 * acc.beta;
    const double a = (c1 + std::sqrt(disc)) / (2.0 * c2);
    if (!(a > 0.1 && a < 10.0)) continue;  // sanity clamp
    const double b = (K1 - G01 * a) / G11;
    t.scale[d] = float(a);
    t.offset[d] = float(b);
  }
  return t;
}



void WriteGmmList(FILE* f, const std::vector<DiagGmm>& gmms) {
  uint32_t n_g = gmms.size();
  std::fwrite(&n_g, 4, 1, f);
  for (const auto& g : gmms) {
    uint32_t dim = g.dim, nc = g.NumComps();
    std::fwrite(&dim, 4, 1, f);
    std::fwrite(&nc, 4, 1, f);
    std::fwrite(g.weights.data(), 4, nc, f);
    std::fwrite(g.means.data(), 4, size_t(nc) * dim, f);
    std::fwrite(g.inv_vars.data(), 4, size_t(nc) * dim, f);
  }
}

bool ReadGmmList(FILE* f, std::vector<DiagGmm>* gmms) {
  uint32_t n_g = 0;
  if (std::fread(&n_g, 4, 1, f) != 1) return false;
  gmms->resize(n_g);
  for (auto& g : *gmms) {
    uint32_t dim = 0, nc = 0;
    if (std::fread(&dim, 4, 1, f) != 1 || std::fread(&nc, 4, 1, f) != 1)
      return false;
    g.dim = dim;
    g.weights.resize(nc);
    g.means.resize(size_t(nc) * dim);
    g.inv_vars.resize(size_t(nc) * dim);
    bool ok = std::fread(g.weights.data(), 4, nc, f) == nc &&
              std::fread(g.means.data(), 4, size_t(nc) * dim, f) ==
                  size_t(nc) * dim &&
              std::fread(g.inv_vars.data(), 4, size_t(nc) * dim, f) ==
                  size_t(nc) * dim;
    if (!ok) return false;
    g.ComputeGconsts();
  }
  return true;
}

}  // namespace efs2
