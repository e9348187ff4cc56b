#include "hmm.h"

#include <cmath>
#include <limits>

namespace efs2 {

namespace {
constexpr float kNegInf = -std::numeric_limits<float>::infinity();
}

int AcousticModel::AddPhone(const std::string& p) {
  auto it = phone_ids.find(p);
  if (it != phone_ids.end()) return it->second;
  int id = int(phones.size());
  phones.push_back(p);
  phone_ids[p] = id;
  gmms.resize(size_t(phones.size()) * kStatesPerPhone);
  return id;
}

// ---------------------------------------------------------------------------
// Graph construction: flatten segments into HMM states with transitions.
//
// State layout: for each segment, kStatesPerPhone consecutive states.
// Transitions: self-loop; state→state+1 within a phone; last state of a
// segment → first state of every following segment reachable by skipping
// zero or more *optional* segments (and to "exit" likewise).

struct Graph {
  // For each state: pdf id and list of (predecessor state, log prob).
  std::vector<int> pdf;
  std::vector<int> seg_of_state;
  std::vector<std::vector<std::pair<int, float>>> preds;
  std::vector<int> entry_states;           // states reachable at t=0
  std::vector<std::pair<int, float>> exits;  // states that may end the utt
};

Graph BuildGraph(const std::vector<int>& seg_state_pdfs,
                 const std::vector<Segment>& segments, float self_loop_prob) {
  Graph g;
  const float log_self = std::log(self_loop_prob);
  const float log_next = std::log(1.0f - self_loop_prob);
  const int n = int(segments.size());
  g.pdf.resize(size_t(n) * kStatesPerPhone);
  g.seg_of_state.resize(size_t(n) * kStatesPerPhone);
  g.preds.resize(size_t(n) * kStatesPerPhone);

  auto first_state = [&](int seg) { return seg * kStatesPerPhone; };
  auto last_state = [&](int seg) { return seg * kStatesPerPhone + kStatesPerPhone - 1; };

  for (int s = 0; s < n; ++s) {
    for (int k = 0; k < kStatesPerPhone; ++k) {
      int st = first_state(s) + k;
      g.pdf[st] = seg_state_pdfs[st];
      g.seg_of_state[st] = s;
      g.preds[st].push_back({st, log_self});
      if (k > 0) g.preds[st].push_back({st - 1, log_next});
    }
  }
  // Cross-segment arcs (with optional-skip chains).
  for (int s = 0; s < n; ++s) {
    // Entry: segment s is an entry if all segments before it are optional.
    bool entry = true;
    for (int p = 0; p < s; ++p)
      if (!segments[p].optional) { entry = false; break; }
    if (entry) g.entry_states.push_back(first_state(s));
    // Predecessors: nearest previous segments across optional runs.
    for (int p = s - 1; p >= 0; --p) {
      g.preds[first_state(s)].push_back({last_state(p), log_next});
      if (!segments[p].optional) break;
    }
    // Exit: segment s may end the utterance if all after it are optional.
    bool exit_ok = true;
    for (int q = s + 1; q < n; ++q)
      if (!segments[q].optional) { exit_ok = false; break; }
    if (exit_ok) g.exits.push_back({last_state(s), log_next});
  }
  return g;
}

float ViterbiAlign(const AcousticModel& model,
                   const std::vector<Segment>& segments,
                   const FeatureMatrix& feats, float self_loop_prob,
                   std::vector<AlignedSegment>* out) {
  std::vector<int> seg_pdfs(segments.size() * kStatesPerPhone);
  for (size_t s = 0; s < segments.size(); ++s)
    for (int k = 0; k < kStatesPerPhone; ++k)
      seg_pdfs[s * kStatesPerPhone + k] = model.PdfId(segments[s].phone, k);
  return ViterbiAlignCd(model.gmms, seg_pdfs, segments, feats,
                        self_loop_prob, out);
}

float ViterbiAlignCd(const std::vector<DiagGmm>& pdfs,
                     const std::vector<int>& seg_state_pdfs,
                     const std::vector<Segment>& segments,
                     const FeatureMatrix& feats, float self_loop_prob,
                     std::vector<AlignedSegment>* out) {
  const int T = feats.rows;
  Graph g = BuildGraph(seg_state_pdfs, segments, self_loop_prob);
  const int S = int(g.pdf.size());
  if (T == 0 || S == 0) return kNegInf;

  std::vector<float> prev(S, kNegInf), cur(S, kNegInf);
  std::vector<int32_t> back(size_t(T) * S, -1);

  // Emission cache per frame (many states share pdfs only across segments
  // with the same phone/context; cache by pdf id).
  std::vector<float> emit(pdfs.size());
  auto fill_emit = [&](int t) {
    std::vector<char> done(pdfs.size(), 0);
    for (int st = 0; st < S; ++st) {
      int p = g.pdf[st];
      if (!done[p]) {
        emit[p] = pdfs[p].LogLikelihood(feats.Row(t));
        done[p] = 1;
      }
    }
  };

  fill_emit(0);
  for (int st : g.entry_states) prev[st] = emit[g.pdf[st]];

  for (int t = 1; t < T; ++t) {
    fill_emit(t);
    for (int st = 0; st < S; ++st) {
      float best = kNegInf;
      int best_prev = -1;
      for (const auto& [ps, lp] : g.preds[st]) {
        float v = prev[ps] + lp;
        if (v > best) { best = v; best_prev = ps; }
      }
      if (best_prev >= 0) {
        cur[st] = best + emit[g.pdf[st]];
        back[size_t(t) * S + st] = best_prev;
      } else {
        cur[st] = kNegInf;
      }
    }
    std::swap(prev, cur);
  }

  // Best exit.
  float best = kNegInf;
  int best_state = -1;
  for (const auto& [st, lp] : g.exits) {
    if (prev[st] > best) { best = prev[st]; best_state = st; }
  }
  if (best_state < 0 || best == kNegInf) return kNegInf;

  // Traceback → frame states → segment spans.
  std::vector<int> path(T);
  path[T - 1] = best_state;
  for (int t = T - 1; t > 0; --t)
    path[t - 1] = back[size_t(t) * S + path[t]];

  out->clear();
  out->resize(segments.size());
  for (size_t s = 0; s < segments.size(); ++s)
    (*out)[s] = {segments[s].phone, 0, 0};
  int seg_prev = -1;
  for (int t = 0; t < T; ++t) {
    int seg = g.seg_of_state[path[t]];
    if (seg != seg_prev) {
      (*out)[seg].start_frame = t;
      seg_prev = seg;
    }
    (*out)[seg].end_frame = t + 1;
  }
  return best;
}

void FlatStartAlign(const std::vector<Segment>& segments, int n_frames,
                    std::vector<AlignedSegment>* out) {
  // Mandatory segments get equal shares; optional silences get a nominal
  // share only at the edges (leading/trailing), none in the middle.
  out->clear();
  std::vector<int> shares(segments.size(), 0);
  int n_mand = 0;
  for (const auto& s : segments)
    if (!s.optional) ++n_mand;
  if (n_mand == 0) n_mand = int(segments.size());
  // Edge optionals take ~5% each when present.
  int edge = int(n_frames * 0.05);
  int used = 0;
  for (size_t i = 0; i < segments.size(); ++i) {
    bool is_edge_opt = segments[i].optional &&
                       (i == 0 || i + 1 == segments.size());
    if (is_edge_opt) { shares[i] = edge; used += edge; }
  }
  int rest = std::max(n_frames - used, n_mand);
  int per = rest / n_mand;
  for (size_t i = 0; i < segments.size(); ++i)
    if (!segments[i].optional) shares[i] = per;
  // Distribute remainder to the last mandatory segment.
  int assigned = 0;
  for (int s : shares) assigned += s;
  for (int i = int(segments.size()) - 1; i >= 0; --i)
    if (!segments[i].optional) { shares[i] += n_frames - assigned; break; }

  int pos = 0;
  out->resize(segments.size());
  for (size_t i = 0; i < segments.size(); ++i) {
    int len = std::max(shares[i], 0);
    len = std::min(len, n_frames - pos);
    (*out)[i] = {segments[i].phone, pos, pos + len};
    pos += len;
  }
}

void AlignmentToPdfIds(const AcousticModel& model,
                       const std::vector<AlignedSegment>& segs,
                       std::vector<int>* frame_pdfs) {
  int T = 0;
  for (const auto& s : segs) T = std::max(T, s.end_frame);
  frame_pdfs->assign(T, -1);
  for (const auto& s : segs) {
    int len = s.end_frame - s.start_frame;
    if (len <= 0) continue;
    for (int t = s.start_frame; t < s.end_frame; ++t) {
      int k = (t - s.start_frame) * kStatesPerPhone / len;
      (*frame_pdfs)[t] = model.PdfId(s.phone, k);
    }
  }
}

void AlignmentToPdfIdsCd(const std::vector<int>& seg_state_pdfs,
                         const std::vector<AlignedSegment>& segs,
                         std::vector<int>* frame_pdfs) {
  int T = 0;
  for (const auto& s : segs) T = std::max(T, s.end_frame);
  frame_pdfs->assign(T, -1);
  for (size_t i = 0; i < segs.size(); ++i) {
    const auto& s = segs[i];
    int len = s.end_frame - s.start_frame;
    if (len <= 0) continue;
    for (int t = s.start_frame; t < s.end_frame; ++t) {
      int k = (t - s.start_frame) * kStatesPerPhone / len;
      (*frame_pdfs)[t] = seg_state_pdfs[i * kStatesPerPhone + k];
    }
  }
}

}  // namespace efs2
