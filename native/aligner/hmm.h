// Monophone 3-state left-to-right HMMs and forced-alignment Viterbi over a
// linear utterance graph with optional silences — the native replacement
// for the reference's Kaldi gmm-align pipeline
// (reference: MFA/montreal_forced_aligner/alignment/multiprocessing.py
// AlignFunction; SURVEY.md §3.4).
#pragma once

#include <string>
#include <unordered_map>
#include <vector>

#include "gmm.h"
#include "mfcc.h"

namespace efs2 {

constexpr int kStatesPerPhone = 3;

// The acoustic model: one GMM per (phone, state).
struct AcousticModel {
  std::vector<std::string> phones;           // phone id → symbol
  std::unordered_map<std::string, int> phone_ids;
  std::vector<DiagGmm> gmms;                 // [phone * 3 + state]

  int AddPhone(const std::string& p);
  int PdfId(int phone, int state) const { return phone * kStatesPerPhone + state; }
};

// One segment of an utterance graph (a phone, possibly skippable).
struct Segment {
  int phone = 0;
  bool optional = false;
};

// Forced-alignment result: per-segment frame spans (skipped → length 0).
struct AlignedSegment {
  int phone = 0;
  int start_frame = 0;
  int end_frame = 0;  // exclusive; == start_frame when skipped
};

// Viterbi forced alignment of features against the segment sequence.
// self_loop_prob controls expected state duration. Returns total log-like
// (-inf if alignment impossible, e.g. fewer frames than mandatory states).
float ViterbiAlign(const AcousticModel& model,
                   const std::vector<Segment>& segments,
                   const FeatureMatrix& feats, float self_loop_prob,
                   std::vector<AlignedSegment>* out);

// Context-dependent variant: emission pdf of (segment, state) comes from an
// explicit table (seg_state_pdfs[seg*kStatesPerPhone+state] indexes pdfs) —
// used by the tied-state triphone pass (tree.h).
float ViterbiAlignCd(const std::vector<DiagGmm>& pdfs,
                     const std::vector<int>& seg_state_pdfs,
                     const std::vector<Segment>& segments,
                     const FeatureMatrix& feats, float self_loop_prob,
                     std::vector<AlignedSegment>* out);

// Frame → pdf via an explicit (segment, state) table.
void AlignmentToPdfIdsCd(const std::vector<int>& seg_state_pdfs,
                         const std::vector<AlignedSegment>& segs,
                         std::vector<int>* frame_pdfs);

// Uniform "flat-start" alignment used before any model exists.
void FlatStartAlign(const std::vector<Segment>& segments, int n_frames,
                    std::vector<AlignedSegment>* out);

// Per-frame state ids for a given alignment (for accumulation):
// frame → pdf id. States inside a phone span are subdivided evenly.
void AlignmentToPdfIds(const AcousticModel& model,
                       const std::vector<AlignedSegment>& segs,
                       std::vector<int>* frame_pdfs);

}  // namespace efs2
