// Diagonal-covariance Gaussian mixture models with Viterbi-EM accumulators
// and binary mixture splitting — the acoustic model of the native forced
// aligner (replaces the reference's Kaldi GMMs reached via kalpy,
// SURVEY.md §2.5).
#pragma once

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

namespace efs2 {

struct DiagGmm {
  // weights[c], means[c*dim+d], inv_vars[c*dim+d], gconsts[c]
  int dim = 0;
  std::vector<float> weights;
  std::vector<float> means;
  std::vector<float> inv_vars;
  std::vector<float> gconsts;  // log w - 0.5*(dim*log(2pi) + sum log var)

  int NumComps() const { return int(weights.size()); }
  void Init(int dim, const float* mean, const float* var);
  void ComputeGconsts();
  float LogLikelihood(const float* x) const;
  // Per-component responsibilities (unnormalized log), returns total loglike.
  float ComponentPosteriors(const float* x, std::vector<float>* post) const;
  void Split();  // double the number of components (perturb means)
};

struct GmmAccumulator {
  int dim = 0;
  int num_comps = 0;
  std::vector<double> occ;        // [c]
  std::vector<double> sum_x;      // [c*dim+d]
  std::vector<double> sum_x2;     // [c*dim+d]

  void Resize(int num_comps, int dim);
  void Add(const DiagGmm& gmm, const float* x, float weight);
  void Merge(const GmmAccumulator& other);
};

// ML update from accumulated stats; variance floored.
void UpdateGmm(const GmmAccumulator& acc, float var_floor, DiagGmm* gmm);

// Serialization (simple binary format).
void WriteGmms(const std::string& path,
               const std::vector<std::string>& phones,
               const std::vector<DiagGmm>& gmms);
bool ReadGmms(const std::string& path, std::vector<std::string>* phones,
              std::vector<DiagGmm>* gmms);
// Raw GMM-list section (used by the triphone model sidecar, tree.h).
void WriteGmmList(std::FILE* f, const std::vector<DiagGmm>& gmms);
bool ReadGmmList(std::FILE* f, std::vector<DiagGmm>* gmms);

// --- Speaker adaptation: diagonal fMLLR (x' = scale ⊙ x + offset). ---
// The native equivalent of MFA's calc_fmllr pass between the two
// alignment passes (MFA/montreal_forced_aligner/alignment/base.py:377-387).

struct FmllrAccumulator {
  // Per-dim sufficient stats of the diagonal-CMLLR objective
  // Q = beta·log a − ½ wᵀGw + kᵀw with w = (a, b):
  //   G = Σ γ/σ² [x² x; x 1],  k = Σ γμ/σ² [x, 1].
  int dim = 0;
  double beta = 0.0;  // total posterior mass (frames)
  std::vector<double> g00, g01, g11, k0, k1;

  void Resize(int dim);
  // Accumulate one frame against a GMM with its component posteriors.
  void Add(const DiagGmm& gmm, const float* x);
  void Merge(const FmllrAccumulator& other);
};

struct DiagTransform {
  std::vector<float> scale, offset;
  void Apply(float* x, int dim) const {
    for (int d = 0; d < dim; ++d) x[d] = x[d] * scale[d] + offset[d];
  }
};

// Closed-form per-dim maximization of the diagonal-CMLLR objective.
// Returns identity when stats are too sparse (beta < min_count).
DiagTransform EstimateDiagFmllr(const FmllrAccumulator& acc,
                                double min_count = 200.0);

}  // namespace efs2
