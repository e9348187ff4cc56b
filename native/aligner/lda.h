// LDA feature-space stage: splice static cepstra over a +-context window,
// estimate a class-discriminant projection from monophone-state alignment
// stats, and transform the corpus into the projected space.
//
// Native equivalent of MFA's LDA acoustic-modeling stage
// (reference: MFA/montreal_forced_aligner/acoustic_modeling/lda_trainer.py,
// which drives Kaldi acc-lda/est-lda over spliced features). The projection
// whitens the within-class scatter (rows are W^{-1/2}-mapped eigenvectors of
// the whitened between-class scatter), so downstream diagonal GMMs see
// unit within-class variance per dimension.
#pragma once

#include <cstdio>
#include <vector>

#include "mfcc.h"

namespace efs2 {

struct LdaOptions {
  int context = 3;      // splice +-context frames of statics
  int num_static = 13;  // leading static cepstra per frame
  int target_dim = 40;
};

// Accumulates total scatter + per-class sums over spliced features.
struct LdaStats {
  int dim = 0;      // spliced dim = num_static * (2*context+1)
  int n_class = 0;
  double count = 0;
  std::vector<double> total_sum;   // [dim]
  std::vector<double> total_sum2;  // [dim*dim], full symmetric scatter
  std::vector<double> class_count; // [class]
  std::vector<double> class_sum;   // [class*dim]

  void Resize(int dim, int n_class);
  void Merge(const LdaStats& other);
};

// Splice the leading num_static dims of rows [t-context, t+context]
// (edge-clamped) into out[dim].
void SpliceRow(const FeatureMatrix& feats, int t, const LdaOptions& opts,
               float* out);

// Accumulate one frame for a class (call with the spliced row).
void LdaAccumulate(const float* spliced, int cls, LdaStats* stats);

// Estimate the projection: returns target_dim x dim row-major matrix.
// Falls back to an identity-like projection if the stats are degenerate.
std::vector<float> EstimateLda(const LdaStats& stats, int target_dim);

// Transform a whole utterance: feats (T x anything with leading statics)
// -> (T x target_dim) projected spliced features.
void LdaTransform(const FeatureMatrix& in, const std::vector<float>& proj,
                  const LdaOptions& opts, FeatureMatrix* out);

// Sidecar serialization (model reuse across runs).
void WriteLda(std::FILE* f, const LdaOptions& opts,
              const std::vector<float>& proj);
bool ReadLda(std::FILE* f, LdaOptions* opts, std::vector<float>* proj);

}  // namespace efs2
