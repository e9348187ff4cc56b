// Tied-state triphone modeling: automatic question generation + greedy
// decision-tree state tying — the native equivalent of the reference MFA
// chain's triphone stage (reference:
// MFA/montreal_forced_aligner/acoustic_modeling/triphone.py, which drives
// Kaldi's build-tree/cluster-phones; SURVEY.md §2.5).
//
// Contexts are taken from the written segment sequence (neighboring phone
// in the transcript, silences included as context values); silence phones
// themselves stay context-independent, as in Kaldi.
#pragma once

#include <cstdio>
#include <vector>

#include "gmm.h"

namespace efs2 {

// Single-Gaussian sufficient stats of one (left, right) context of a
// (phone, hmm-state) pair.
struct ContextStats {
  int left = 0, right = 0;
  double count = 0;
  std::vector<double> sum, sum2;  // [dim]
};

struct TreeNode {
  int side = 0;       // 0: question about left context, 1: right
  int question = -1;  // index into TriphoneTree::questions; -1 → leaf
  int yes = -1, no = -1;
  int pdf = -1;       // leaf: tied-state pdf id
};

struct TriphoneTree {
  int n_phones = 0;
  std::vector<std::vector<int>> questions;   // sorted phone-id sets
  std::vector<std::vector<TreeNode>> trees;  // [phone*kStates+state], root 0
  int n_pdfs = 0;

  bool empty() const { return trees.empty(); }
  // Tied pdf for (phone, state) in context (left, right); works for unseen
  // contexts (questions are set-membership tests).
  int Lookup(int phone, int state, int left, int right) const;
};

struct TriphoneBuildOptions {
  float min_gain = 200.0f;  // log-likelihood gain required to split
  float min_count = 100.0f; // minimum frames per leaf
  int max_leaves = 4000;    // global tied-state budget
};

// Kaldi-style automatic questions: agglomerative clustering of phones by
// their monophone mid-state mean vectors; every internal node's phone set
// (plus singletons) becomes a question.
std::vector<std::vector<int>> GenerateQuestions(
    const std::vector<std::vector<float>>& phone_means);

// Greedy top-down tying. stats[phone*kStates+state] lists the observed
// contexts; ctx_independent phones get a single leaf per state.
// Writes one single-Gaussian DiagGmm per leaf into *leaf_gmms.
TriphoneTree BuildTree(int n_phones, int states_per_phone, int dim,
                       const std::vector<std::vector<ContextStats>>& stats,
                       const std::vector<char>& ctx_independent,
                       const std::vector<std::vector<int>>& questions,
                       const TriphoneBuildOptions& opts,
                       std::vector<DiagGmm>* leaf_gmms);

// Serialization of the tree section (magic EFS2TR01).
void WriteTree(std::FILE* f, const TriphoneTree& tree);
bool ReadTree(std::FILE* f, TriphoneTree* tree);

}  // namespace efs2
