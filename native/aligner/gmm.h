// Diagonal-covariance Gaussian mixture models with Viterbi-EM accumulators
// and binary mixture splitting — the acoustic model of the native forced
// aligner (replaces the reference's Kaldi GMMs reached via kalpy,
// SURVEY.md §2.5).
#pragma once

#include <cstdint>
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

}  // namespace efs2
