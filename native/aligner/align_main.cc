// efs2-aligner: native Mandarin forced aligner.
//
// Replaces the reference's vendored MFA + Kaldi subsystem for the TTS data
// path (SURVEY.md §2.5, §3.4): ingests a raw_data corpus
// (<speaker>/<utt>.wav + .lab pinyin transcripts), trains monophone
// GMM-HMMs by Viterbi-EM from a flat start, force-aligns every utterance,
// and writes MFA-style TextGrids with a "phones" interval tier that the
// Python Preprocessor consumes unchanged.
//
// Usage:
//   efs2-aligner align --corpus raw_data --out preprocessed/TextGrid \
//       [--iters 8] [--mix-up 4] [--threads N] [--model am.bin]
//   efs2-aligner train --corpus ... --model am.bin [...]   (train only)
//
// Multithreading: utterances fan out over a thread pool per EM iteration,
// mirroring MFA's multiprocessing job runner (MFA/utils.py:653-760) without
// a database or worker processes.

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <functional>
#include <sstream>
#include <mutex>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <vector>

#include <unordered_map>

#include "gmm.h"
#include "hmm.h"
#include "lda.h"
#include "mfcc.h"
#include "pinyin.h"
#include "tree.h"
#include "wav.h"

namespace efs2 {
namespace {

using Lexicon = std::unordered_map<std::string, std::vector<std::string>>;

// --tri-auto band (median monophone-aligned frames per occupied non-silence
// (phone,state) root).  Calibrated on ALIGN_BENCH v2's exact-GT corpora:
// tri strictly beats mono on BOTH recall@20ms and recall@50ms at zh/40
// (median 64 f/state) and en/40 (29), and loses recall@50ms at micro zh (9),
// en/240 (176) and zh/240 (343) — below the band the tied-state leaves are
// under-trained, above it the mixed-up monophone GMMs have saturated.  See
// ALIGN_BENCH.md "Auto selection" for the per-corpus measurements.
constexpr double kTriAutoMinFramesPerState = 25.0;
constexpr double kTriAutoMaxFramesPerState = 150.0;

// MFA-format pronunciation dictionary: "word [prob...] phone phone ..."
// (reference: MFA dictionary format, e.g.
// MFA/tests/data/dictionaries/english_us_mfa_reduced.dict; our own
// lexicon/mandarin_pinyin.dict is "word<TAB>phones"). Numeric fields after
// the word (pronunciation/silence probabilities) are skipped. First
// pronunciation of a word wins.
Lexicon LoadLexicon(const std::string& path) {
  Lexicon lex;
  std::ifstream in(path);
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream iss(line);
    std::string word;
    if (!(iss >> word)) continue;
    std::vector<std::string> toks, phones;
    std::string t;
    while (iss >> t) toks.push_back(t);
    bool in_probs = true;
    for (const auto& tok : toks) {
      if (in_probs) {
        char* end = nullptr;
        std::strtod(tok.c_str(), &end);
        if (end && *end == '\0') continue;  // numeric → probability column
        in_probs = false;
      }
      phones.push_back(tok);
    }
    if (!phones.empty() && !lex.count(word)) lex[word] = phones;
  }
  return lex;
}

struct Utterance {
  std::string speaker;
  std::string basename;
  std::string wav_path;
  std::vector<std::vector<std::string>> words;  // phones per syllable
  std::vector<std::string> word_texts;          // original .lab tokens
  // Filled during processing:
  FeatureMatrix feats;
  std::vector<Segment> segments;
  std::vector<int> seg_word;  // segment index → word index (-1: sil/sp)
  float duration_s = 0.0f;
};

std::vector<std::string> ListDir(const std::string& path) {
  std::vector<std::string> out;
  DIR* d = opendir(path.c_str());
  if (!d) return out;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name != "." && name != "..") out.push_back(name);
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

bool IsDir(const std::string& path) {
  struct stat st;
  return stat(path.c_str(), &st) == 0 && S_ISDIR(st.st_mode);
}

void MkDirs(const std::string& path) {
  std::string cur;
  for (size_t i = 0; i < path.size(); ++i) {
    cur += path[i];
    if (path[i] == '/' || i + 1 == path.size()) mkdir(cur.c_str(), 0755);
  }
}

std::vector<Utterance> ScanCorpus(const std::string& corpus,
                                  const Lexicon& lexicon) {
  std::vector<Utterance> utts;
  for (const auto& speaker : ListDir(corpus)) {
    std::string spk_dir = corpus + "/" + speaker;
    if (!IsDir(spk_dir)) continue;
    for (const auto& f : ListDir(spk_dir)) {
      if (f.size() < 5 || f.substr(f.size() - 4) != ".wav") continue;
      std::string base = f.substr(0, f.size() - 4);
      std::string lab = spk_dir + "/" + base + ".lab";
      std::ifstream in(lab);
      if (!in) continue;
      std::string text, line;
      while (std::getline(in, line)) text += line + " ";
      Utterance u;
      u.speaker = speaker;
      u.basename = base;
      u.wav_path = spk_dir + "/" + f;
      std::istringstream iss(text);
      std::string syl;
      while (iss >> syl) {
        // Explicit lexicon first (words of any language), pinyin
        // initial/final decomposition as the fallback.
        auto it = lexicon.find(syl);
        if (it == lexicon.end()) {
          std::string lower = syl;
          std::transform(lower.begin(), lower.end(), lower.begin(),
                         [](unsigned char c) { return std::tolower(c); });
          it = lexicon.find(lower);
        }
        if (it != lexicon.end()) {
          u.words.push_back(it->second);
          u.word_texts.push_back(syl);
          continue;
        }
        auto ph = PinyinToPhonemes(syl);
        if (!ph.empty()) {
          u.words.push_back(ph);
          u.word_texts.push_back(syl);
        }
      }
      if (!u.words.empty()) utts.push_back(std::move(u));
    }
  }
  return utts;
}

// Build segment sequence: optional sil at edges, optional sp between words.
void BuildSegments(AcousticModel* model, Utterance* u) {
  int sil = model->AddPhone("sil");
  int sp = model->AddPhone("sp");
  u->segments.clear();
  u->seg_word.clear();
  u->segments.push_back({sil, true});
  u->seg_word.push_back(-1);
  for (size_t w = 0; w < u->words.size(); ++w) {
    if (w > 0) {
      u->segments.push_back({sp, true});
      u->seg_word.push_back(-1);
    }
    for (const auto& p : u->words[w]) {
      u->segments.push_back({model->AddPhone(p), false});
      u->seg_word.push_back(int(w));
    }
  }
  u->segments.push_back({sil, true});
  u->seg_word.push_back(-1);
}

void ParallelFor(int n, int threads, const std::function<void(int, int)>& fn) {
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  for (int w = 0; w < threads; ++w) {
    pool.emplace_back([&, w] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i, w);
    });
  }
  for (auto& t : pool) t.join();
}

void WriteTextGridFile(const std::string& path, const Utterance& u,
                       const AcousticModel& model,
                       const std::vector<AlignedSegment>& segs,
                       float frame_shift_s) {
  std::ofstream out(path);
  float xmax = u.duration_s;
  // Two tiers, words then phones, like MFA's export
  // (MFA/montreal_forced_aligner/textgrid.py:344-361); downstream TTS
  // consumers read only "phones" (reference preprocessor.py:239), the
  // words tier is the user-facing artifact parity.
  struct Iv { float s, e; std::string t; };
  auto tile = [&](std::vector<Iv> raw) {
    // Fill gaps with "" intervals so the tier tiles [0, xmax].
    std::vector<Iv> ivs;
    float pos = 0.0f;
    for (const auto& r : raw) {
      if (r.e <= r.s) continue;
      float a = r.s, b = std::min(r.e, xmax);
      if (a > pos + 1e-4f) ivs.push_back({pos, a, ""});
      ivs.push_back({a, b, r.t});
      pos = b;
    }
    if (pos < xmax - 1e-4f) ivs.push_back({pos, xmax, ""});
    if (!ivs.empty()) ivs.back().e = xmax;
    return ivs;
  };

  std::vector<Iv> phone_raw;
  for (const auto& s : segs)
    phone_raw.push_back({s.start_frame * frame_shift_s,
                         s.end_frame * frame_shift_s,
                         model.phones[s.phone]});
  // Word spans: union of each word's (mandatory, hence non-empty) phone
  // segments; segs is positionally 1:1 with u.segments/u.seg_word.
  std::vector<Iv> word_raw;
  int prev_w = -1;
  for (size_t i = 0; i < segs.size() && i < u.seg_word.size(); ++i) {
    int w = u.seg_word[i];
    if (w < 0 || segs[i].end_frame <= segs[i].start_frame) continue;
    float a = segs[i].start_frame * frame_shift_s;
    float b = segs[i].end_frame * frame_shift_s;
    if (w == prev_w) {
      word_raw.back().e = b;  // extend the current word's span
    } else {
      word_raw.push_back(
          {a, b, w < int(u.word_texts.size()) ? u.word_texts[w] : ""});
      prev_w = w;
    }
  }

  auto write_tier = [&](int idx, const char* name,
                        const std::vector<Iv>& ivs) {
    out << "    item [" << idx << "]:\n        class = \"IntervalTier\"\n";
    out << "        name = \"" << name << "\"\n        xmin = 0.000000\n";
    out << "        xmax = " << xmax << "\n";
    out << "        intervals: size = " << ivs.size() << "\n";
    for (size_t i = 0; i < ivs.size(); ++i) {
      out << "        intervals [" << (i + 1) << "]:\n";
      out << "            xmin = " << ivs[i].s << "\n";
      out << "            xmax = " << ivs[i].e << "\n";
      out << "            text = \"" << ivs[i].t << "\"\n";
    }
  };

  out << "File type = \"ooTextFile\"\nObject class = \"TextGrid\"\n\n";
  out << "xmin = 0.000000\nxmax = " << xmax << "\n";
  out << "tiers? <exists>\nsize = 2\nitem []:\n";
  write_tier(1, "words", tile(std::move(word_raw)));
  write_tier(2, "phones", tile(std::move(phone_raw)));
}

int Run(int argc, char** argv) {
  std::string mode = argc > 1 ? argv[1] : "";
  std::string corpus, out_dir, model_path, lexicon_path;
  int iters = 8, threads = int(std::thread::hardware_concurrency());
  int mix_up = 4;
  bool adapt = true;      // fMLLR-style speaker adaptation between passes
  bool triphone = true;   // tied-state triphone second stage
  bool tri_auto = false;  // data-volume-based mono/tri selection (--tri-auto)
  bool lda = false;       // LDA feature-space stage after the mono pass
  int lda_iters = 6;
  LdaOptions lda_opts;
  int tri_iters = 6, tri_mix_up = 8;
  TriphoneBuildOptions tri_opts;
  for (int i = 2; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(i + 1 < argc ? argv[++i] : ""); };
    if (a == "--corpus") corpus = next();
    else if (a == "--out") out_dir = next();
    else if (a == "--model") model_path = next();
    else if (a == "--lexicon") lexicon_path = next();
    else if (a == "--iters") iters = std::stoi(next());
    else if (a == "--mix-up") mix_up = std::stoi(next());
    else if (a == "--threads") threads = std::stoi(next());
    else if (a == "--no-adapt") adapt = false;
    else if (a == "--no-triphone") triphone = false;
    else if (a == "--tri-auto") tri_auto = true;
    else if (a == "--lda") lda = true;
    else if (a == "--lda-dim") lda_opts.target_dim = std::stoi(next());
    else if (a == "--lda-context") lda_opts.context = std::stoi(next());
    else if (a == "--lda-iters") lda_iters = std::stoi(next());
    else if (a == "--tri-iters") tri_iters = std::stoi(next());
    else if (a == "--tri-mix-up") tri_mix_up = std::stoi(next());
    else if (a == "--tri-min-gain") tri_opts.min_gain = std::stof(next());
    else if (a == "--tri-min-count") tri_opts.min_count = std::stof(next());
    else if (a == "--tri-max-leaves") tri_opts.max_leaves = std::stoi(next());
  }
  if ((mode != "align" && mode != "train") || corpus.empty() ||
      (mode == "align" && out_dir.empty())) {
    std::fprintf(stderr,
                 "usage: efs2-aligner {align|train} --corpus DIR "
                 "[--out DIR] [--model FILE] [--lexicon FILE] [--iters N] "
                 "[--mix-up M] [--threads N] [--no-adapt] [--no-triphone] "
                 "[--lda] [--lda-dim D] [--lda-context C] [--lda-iters N] "
                 "[--tri-iters N] [--tri-mix-up M] [--tri-min-gain G] "
                 "[--tri-min-count C] [--tri-max-leaves L]\n");
    return 2;
  }
  threads = std::max(threads, 1);

  Lexicon lexicon;
  if (!lexicon_path.empty()) {
    lexicon = LoadLexicon(lexicon_path);
    std::fprintf(stderr, "lexicon: %zu entries\n", lexicon.size());
  }
  auto utts = ScanCorpus(corpus, lexicon);
  std::fprintf(stderr, "corpus: %zu utterances\n", utts.size());
  if (utts.empty()) return 1;

  AcousticModel model;
  for (auto& u : utts) BuildSegments(&model, &u);
  const int n_pdfs = int(model.gmms.size());
  std::fprintf(stderr, "phones: %zu, pdfs: %d\n", model.phones.size(), n_pdfs);

  // Feature extraction (parallel).
  MfccConfig mfcc_cfg;
  std::atomic<int> failed(0);
  ParallelFor(int(utts.size()), threads, [&](int i, int) {
    Wave wav;
    if (!ReadWav(utts[i].wav_path, &wav)) {
      failed.fetch_add(1);
      return;
    }
    utts[i].duration_s = float(wav.samples.size()) / wav.sample_rate;
    ComputeMfcc(wav.samples, wav.sample_rate, mfcc_cfg, &utts[i].feats);
  });
  std::fprintf(stderr, "features done (%d failed)\n", failed.load());
  const float shift_s = mfcc_cfg.frame_shift_ms / 1000.0f;
  int dim = mfcc_cfg.deltas ? mfcc_cfg.num_ceps * 3 : mfcc_cfg.num_ceps;
  lda_opts.num_static = mfcc_cfg.num_ceps;

  bool have_model = false;
  if (!model_path.empty()) {
    std::vector<std::string> phones;
    std::vector<DiagGmm> gmms;
    if (ReadGmms(model_path, &phones, &gmms)) {
      // A saved LDA sidecar means the model's GMMs live in the projected
      // space: transform the features first so dimensions match.
      FILE* lf = std::fopen((model_path + ".lda").c_str(), "rb");
      if (lf) {
        std::vector<float> proj;
        if (ReadLda(lf, &lda_opts, &proj)) {
          ParallelFor(int(utts.size()), threads, [&](int i, int) {
            FeatureMatrix out;
            LdaTransform(utts[i].feats, proj, lda_opts, &out);
            utts[i].feats = std::move(out);
          });
          dim = lda_opts.target_dim;
          lda = false;  // already applied
          std::fprintf(stderr, "loaded LDA projection (%d dims)\n", dim);
        }
        std::fclose(lf);
      }
      // Remap to current phone table.
      AcousticModel loaded;
      for (const auto& p : phones) loaded.AddPhone(p);
      loaded.gmms = gmms;
      bool ok = true;
      for (const auto& p : model.phones)
        if (!loaded.phone_ids.count(p)) ok = false;
      if (ok && !loaded.gmms.empty() && loaded.gmms[0].dim == dim) {
        for (size_t ph = 0; ph < model.phones.size(); ++ph) {
          int lp = loaded.phone_ids[model.phones[ph]];
          for (int k = 0; k < kStatesPerPhone; ++k)
            model.gmms[model.PdfId(int(ph), k)] =
                loaded.gmms[loaded.PdfId(lp, k)];
        }
        have_model = true;
        std::fprintf(stderr, "loaded model %s\n", model_path.c_str());
      }
    }
  }

  // Viterbi-EM over the monophone model (shared by the flat-start stage and
  // the post-LDA re-estimation; `dim` is captured by reference since LDA
  // changes the feature space between calls).
  auto run_viterbi_em = [&](int n_iters, int mix_to, bool flat_first,
                            const char* tag) {
    for (int iter = 0; iter < n_iters; ++iter) {
      std::vector<std::vector<GmmAccumulator>> worker_accs(threads);
      for (auto& wa : worker_accs) {
        wa.resize(n_pdfs);
        for (int p = 0; p < n_pdfs; ++p)
          wa[p].Resize(model.gmms[p].NumComps(), dim);
      }
      std::atomic<long long> frames_done(0);
      double total_ll = 0;
      std::mutex ll_mu;
      bool flat = flat_first && iter == 0;
      ParallelFor(int(utts.size()), threads, [&](int i, int w) {
        auto& u = utts[i];
        if (u.feats.rows < int(u.segments.size())) return;
        std::vector<AlignedSegment> segs;
        if (flat) {
          FlatStartAlign(u.segments, u.feats.rows, &segs);
        } else {
          float ll = ViterbiAlign(model, u.segments, u.feats, 0.6f, &segs);
          if (!std::isfinite(ll)) return;
          std::lock_guard<std::mutex> lk(ll_mu);
          total_ll += ll;
        }
        std::vector<int> pdfs;
        AlignmentToPdfIds(model, segs, &pdfs);
        for (int t = 0; t < int(pdfs.size()) && t < u.feats.rows; ++t)
          if (pdfs[t] >= 0)
            worker_accs[w][pdfs[t]].Add(model.gmms[pdfs[t]], u.feats.Row(t),
                                        1.0f);
        frames_done.fetch_add(u.feats.rows);
      });
      for (int p = 0; p < n_pdfs; ++p) {
        for (int w = 1; w < threads; ++w)
          worker_accs[0][p].Merge(worker_accs[w][p]);
        UpdateGmm(worker_accs[0][p], 0.01f, &model.gmms[p]);
      }
      // Mixture splitting schedule: double comps until mix_to.
      if (model.gmms[0].NumComps() < mix_to && iter >= 1 && iter % 2 == 1) {
        for (auto& g : model.gmms) g.Split();
      }
      std::fprintf(stderr,
                   "%s iter %d: %lld frames, avg ll/frame %.3f, comps %d\n",
                   tag, iter, frames_done.load(),
                   flat ? 0.0
                        : total_ll / std::max(1.0, double(frames_done.load())),
                   model.gmms[0].NumComps());
    }
  };

  if (!have_model) {
    // ---- Flat start: global mean/var, then uniform-alignment stats.
    std::vector<double> gsum(dim, 0), gsum2(dim, 0);
    double gcount = 0;
    for (auto& u : utts)
      for (int t = 0; t < u.feats.rows; ++t) {
        const float* x = u.feats.Row(t);
        for (int d = 0; d < dim; ++d) {
          gsum[d] += x[d];
          gsum2[d] += double(x[d]) * x[d];
        }
        gcount += 1;
      }
    std::vector<float> gmean(dim), gvar(dim);
    for (int d = 0; d < dim; ++d) {
      gmean[d] = float(gsum[d] / gcount);
      gvar[d] = float(gsum2[d] / gcount - gmean[d] * gmean[d]);
    }
    for (auto& g : model.gmms) g.Init(dim, gmean.data(), gvar.data());

    run_viterbi_em(iters, mix_up, /*flat_first=*/true, "mono");
    if (!model_path.empty()) WriteGmms(model_path, model.phones, model.gmms);
  }

  // ---- LDA feature-space stage (reference: MFA's mono→LDA chain,
  // MFA/montreal_forced_aligner/acoustic_modeling/lda_trainer.py driving
  // Kaldi acc-lda/est-lda): monophone-alignment classes over spliced static
  // cepstra → discriminant projection → corpus transformed → GMMs
  // re-estimated in the projected space.
  if (lda) {
    const int sd = lda_opts.num_static * (2 * lda_opts.context + 1);
    std::vector<LdaStats> wlda(threads);
    for (auto& s : wlda) s.Resize(sd, n_pdfs);
    std::vector<std::vector<int>> frame_pdfs(utts.size());
    ParallelFor(int(utts.size()), threads, [&](int i, int w) {
      auto& u = utts[i];
      std::vector<AlignedSegment> segs;
      float ll = ViterbiAlign(model, u.segments, u.feats, 0.6f, &segs);
      if (!std::isfinite(ll)) return;
      AlignmentToPdfIds(model, segs, &frame_pdfs[i]);
      std::vector<float> spliced(sd);
      const auto& pdfs = frame_pdfs[i];
      for (int t = 0; t < int(pdfs.size()) && t < u.feats.rows; ++t) {
        if (pdfs[t] < 0) continue;
        SpliceRow(u.feats, t, lda_opts, spliced.data());
        LdaAccumulate(spliced.data(), pdfs[t], &wlda[w]);
      }
    });
    for (int w = 1; w < threads; ++w) wlda[0].Merge(wlda[w]);
    auto proj = EstimateLda(wlda[0], lda_opts.target_dim);
    ParallelFor(int(utts.size()), threads, [&](int i, int) {
      FeatureMatrix out;
      LdaTransform(utts[i].feats, proj, lda_opts, &out);
      utts[i].feats = std::move(out);
    });
    dim = lda_opts.target_dim;
    // Re-seed the GMMs in the projected space from the saved alignment
    // (single component per pdf; mixtures regrow during re-estimation).
    std::vector<std::vector<double>> psum(n_pdfs), psum2(n_pdfs);
    std::vector<double> pcount(n_pdfs, 0.0);
    for (int p = 0; p < n_pdfs; ++p) {
      psum[p].assign(dim, 0.0);
      psum2[p].assign(dim, 0.0);
    }
    for (size_t i = 0; i < utts.size(); ++i) {
      const auto& pdfs = frame_pdfs[i];
      const auto& f = utts[i].feats;
      for (int t = 0; t < int(pdfs.size()) && t < f.rows; ++t) {
        int p = pdfs[t];
        if (p < 0) continue;
        const float* x = f.Row(t);
        pcount[p] += 1;
        for (int d = 0; d < dim; ++d) {
          psum[p][d] += x[d];
          psum2[p][d] += double(x[d]) * x[d];
        }
      }
    }
    for (int p = 0; p < n_pdfs; ++p) {
      std::vector<float> mean(dim, 0.0f), var(dim, 1.0f);
      if (pcount[p] >= 3) {
        for (int d = 0; d < dim; ++d) {
          mean[d] = float(psum[p][d] / pcount[p]);
          var[d] = std::max(
              float(psum2[p][d] / pcount[p] - mean[d] * mean[d]), 1e-3f);
        }
      }
      model.gmms[p].Init(dim, mean.data(), var.data());
    }
    std::fprintf(stderr, "lda: projected to %d dims (spliced %d)\n", dim, sd);
    run_viterbi_em(lda_iters, mix_up, /*flat_first=*/false, "lda");
    if (!model_path.empty()) {
      WriteGmms(model_path, model.phones, model.gmms);
      FILE* f = std::fopen((model_path + ".lda").c_str(), "wb");
      if (f) {
        WriteLda(f, lda_opts, proj);
        std::fclose(f);
      }
    }
  }

  // ---- Speaker-adaptive second pass (diagonal fMLLR): first-pass align,
  // per-speaker transform estimation, features transformed in place — the
  // native equivalent of MFA's align → calc_fmllr → align
  // (MFA/montreal_forced_aligner/alignment/base.py:344-410).
  if (adapt) {
    std::unordered_map<std::string, int> spk_ids;
    for (auto& u : utts)
      if (!spk_ids.count(u.speaker)) {
        int id = int(spk_ids.size());
        spk_ids[u.speaker] = id;
      }
    const int n_spk = int(spk_ids.size());
    std::vector<std::vector<FmllrAccumulator>> worker_spk(threads);
    for (auto& ws : worker_spk) {
      ws.resize(n_spk);
      for (auto& a : ws) a.Resize(dim);
    }
    std::mutex ll_mu;
    double ll_pass1 = 0;
    long long frames_pass1 = 0;
    ParallelFor(int(utts.size()), threads, [&](int i, int w) {
      auto& u = utts[i];
      std::vector<AlignedSegment> segs;
      float ll = ViterbiAlign(model, u.segments, u.feats, 0.6f, &segs);
      if (!std::isfinite(ll)) return;
      std::vector<int> pdfs;
      AlignmentToPdfIds(model, segs, &pdfs);
      FmllrAccumulator& acc = worker_spk[w][spk_ids[u.speaker]];
      for (int t = 0; t < int(pdfs.size()) && t < u.feats.rows; ++t)
        if (pdfs[t] >= 0) acc.Add(model.gmms[pdfs[t]], u.feats.Row(t));
      std::lock_guard<std::mutex> lk(ll_mu);
      ll_pass1 += ll;
      frames_pass1 += u.feats.rows;
    });
    std::vector<DiagTransform> trans(n_spk);
    double mean_dev = 0;
    for (int s = 0; s < n_spk; ++s) {
      for (int w = 1; w < threads; ++w)
        worker_spk[0][s].Merge(worker_spk[w][s]);
      trans[s] = EstimateDiagFmllr(worker_spk[0][s]);
      for (int d = 0; d < dim; ++d)
        mean_dev += std::fabs(trans[s].scale[d] - 1.0f);
    }
    ParallelFor(int(utts.size()), threads, [&](int i, int) {
      auto& u = utts[i];
      const DiagTransform& t = trans[spk_ids[u.speaker]];
      for (int r = 0; r < u.feats.rows; ++r) t.Apply(u.feats.Row(r), dim);
    });
    std::fprintf(stderr,
                 "speaker adapt: %d speakers, pass1 ll/frame %.3f, "
                 "mean |scale-1| %.4f\n",
                 n_spk, ll_pass1 / std::max(1LL, frames_pass1),
                 mean_dev / std::max(1, n_spk * dim));
  }

  // ---- Tied-state triphone stage (reference: MFA's mono→triphone chain,
  // MFA/montreal_forced_aligner/acoustic_modeling/triphone.py): contexts
  // come from the written segment sequence; trees per (phone, state) with
  // auto-generated questions; leaf GMMs re-estimated by Viterbi-EM.
  const int n_phones = int(model.phones.size());
  const int sil_id = model.phone_ids.count("sil") ? model.phone_ids["sil"] : 0;
  auto tri_seg_pdfs = [&](const TriphoneTree& tr,
                          const std::vector<Segment>& segs) {
    std::vector<int> out(segs.size() * kStatesPerPhone);
    for (size_t s = 0; s < segs.size(); ++s) {
      int left = s > 0 ? segs[s - 1].phone : sil_id;
      int right = s + 1 < segs.size() ? segs[s + 1].phone : sil_id;
      for (int k = 0; k < kStatesPerPhone; ++k)
        out[s * kStatesPerPhone + k] = tr.Lookup(segs[s].phone, k, left,
                                                 right);
    }
    return out;
  };

  TriphoneTree tree;
  std::vector<DiagGmm> tri_pdfs;
  bool have_tri = false;
  if (!model_path.empty() && have_model) {
    FILE* f = std::fopen((model_path + ".tri").c_str(), "rb");
    if (f) {
      have_tri = ReadTree(f, &tree) && ReadGmmList(f, &tri_pdfs);
      std::fclose(f);
      if (have_tri)
        std::fprintf(stderr, "loaded triphone model (%d tied states)\n",
                     tree.n_pdfs);
    }
  }

  if ((triphone || tri_auto) && !have_tri) {
    // Context stats from a monophone alignment pass.
    const int n_roots = n_phones * kStatesPerPhone;
    std::vector<std::vector<std::unordered_map<long long, ContextStats>>>
        wstats(threads);
    for (auto& ws : wstats) ws.resize(n_roots);
    ParallelFor(int(utts.size()), threads, [&](int i, int w) {
      auto& u = utts[i];
      std::vector<AlignedSegment> segs;
      float ll = ViterbiAlign(model, u.segments, u.feats, 0.6f, &segs);
      if (!std::isfinite(ll)) return;
      for (size_t s = 0; s < segs.size(); ++s) {
        int len = segs[s].end_frame - segs[s].start_frame;
        if (len <= 0) continue;
        int left = s > 0 ? u.segments[s - 1].phone : sil_id;
        int right = s + 1 < segs.size() ? u.segments[s + 1].phone : sil_id;
        long long key = (long long)left * n_phones + right;
        for (int t = segs[s].start_frame; t < segs[s].end_frame; ++t) {
          if (t >= u.feats.rows) break;
          int k = (t - segs[s].start_frame) * kStatesPerPhone / len;
          auto& cs = wstats[w][segs[s].phone * kStatesPerPhone + k][key];
          if (cs.sum.empty()) {
            cs.left = left;
            cs.right = right;
            cs.sum.assign(dim, 0.0);
            cs.sum2.assign(dim, 0.0);
          }
          const float* x = u.feats.Row(t);
          cs.count += 1;
          for (int d = 0; d < dim; ++d) {
            cs.sum[d] += x[d];
            cs.sum2[d] += double(x[d]) * x[d];
          }
        }
      }
    });
    std::vector<std::vector<ContextStats>> stats(n_roots);
    for (int r = 0; r < n_roots; ++r) {
      std::unordered_map<long long, ContextStats> merged;
      for (int w = 0; w < threads; ++w)
        for (auto& [key, cs] : wstats[w][r]) {
          auto& m = merged[key];
          if (m.sum.empty()) {
            m = cs;
          } else {
            m.count += cs.count;
            for (int d = 0; d < dim; ++d) {
              m.sum[d] += cs.sum[d];
              m.sum2[d] += cs.sum2[d];
            }
          }
        }
      stats[r].reserve(merged.size());
      for (auto& [key, cs] : merged) stats[r].push_back(std::move(cs));
    }

    // Per-state data-volume statistic for mono/tri auto-selection: median
    // observed frames per occupied non-silence (phone,state) root under the
    // monophone alignment.  ALIGN_BENCH v2 (ALIGN_BENCH.md) measured the
    // tied-state tree to win only in a mid-data band — with very little
    // data the leaf GMMs are under-trained (micro corpora: tri loses
    // recall@50ms), and with saturating data the monophone mixtures already
    // model each state (N=240: tri ties @20ms, loses ~1pt @50ms) — so
    // --tri-auto engages the triphone stage only inside the band.
    std::vector<double> root_frames;
    for (int r = 0; r < n_roots; ++r) {
      const std::string& ph = model.phones[r / kStatesPerPhone];
      if (ph == "sil" || ph == "sp") continue;
      double c = 0;
      for (const auto& cs : stats[r]) c += cs.count;
      if (c > 0) root_frames.push_back(c);
    }
    double median_fps = 0;
    if (!root_frames.empty()) {
      std::nth_element(root_frames.begin(),
                       root_frames.begin() + root_frames.size() / 2,
                       root_frames.end());
      median_fps = root_frames[root_frames.size() / 2];
    }
    std::fprintf(stderr,
                 "state-volume: %zu occupied non-sil states, median "
                 "frames/state %.0f\n",
                 root_frames.size(), median_fps);
    if (tri_auto) {
      bool use_tri = median_fps >= kTriAutoMinFramesPerState &&
                     median_fps <= kTriAutoMaxFramesPerState;
      std::fprintf(stderr, "tri-auto: median frames/state %.0f %s [%.0f, "
                   "%.0f] -> %s\n",
                   median_fps, use_tri ? "inside" : "outside",
                   kTriAutoMinFramesPerState, kTriAutoMaxFramesPerState,
                   use_tri ? "triphone" : "monophone");
      if (!use_tri) goto after_triphone;
    }

    // Questions from monophone mid-state means (weighted over components).
    std::vector<std::vector<float>> phone_means(n_phones,
                                                std::vector<float>(dim, 0));
    for (int p = 0; p < n_phones; ++p) {
      const DiagGmm& g = model.gmms[model.PdfId(p, 1)];
      for (int c = 0; c < g.NumComps(); ++c)
        for (int d = 0; d < dim; ++d)
          phone_means[p][d] += g.weights[c] * g.means[size_t(c) * dim + d];
    }
    auto questions = GenerateQuestions(phone_means);

    std::vector<char> ctx_ind(n_phones, 0);
    for (int p = 0; p < n_phones; ++p)
      if (model.phones[p] == "sil" || model.phones[p] == "sp") ctx_ind[p] = 1;

    tree = BuildTree(n_phones, kStatesPerPhone, dim, stats, ctx_ind,
                     questions, tri_opts, &tri_pdfs);
    std::fprintf(stderr,
                 "triphone tree: %d tied states from %d roots "
                 "(%zu questions)\n",
                 tree.n_pdfs, n_roots, questions.size());

    // Viterbi-EM re-estimation of the tied-state GMMs.
    for (int iter = 0; iter < tri_iters; ++iter) {
      std::vector<std::vector<GmmAccumulator>> worker_accs(threads);
      for (auto& wa : worker_accs) {
        wa.resize(tree.n_pdfs);
        for (int p = 0; p < tree.n_pdfs; ++p)
          wa[p].Resize(tri_pdfs[p].NumComps(), dim);
      }
      std::atomic<long long> frames_done(0);
      double total_ll = 0;
      std::mutex tri_mu;
      ParallelFor(int(utts.size()), threads, [&](int i, int w) {
        auto& u = utts[i];
        if (u.feats.rows < int(u.segments.size())) return;
        auto pdf_tab = tri_seg_pdfs(tree, u.segments);
        std::vector<AlignedSegment> segs;
        float ll = ViterbiAlignCd(tri_pdfs, pdf_tab, u.segments, u.feats,
                                  0.6f, &segs);
        if (!std::isfinite(ll)) return;
        std::vector<int> pdfs;
        AlignmentToPdfIdsCd(pdf_tab, segs, &pdfs);
        for (int t = 0; t < int(pdfs.size()) && t < u.feats.rows; ++t)
          if (pdfs[t] >= 0)
            worker_accs[w][pdfs[t]].Add(tri_pdfs[pdfs[t]], u.feats.Row(t),
                                        1.0f);
        frames_done.fetch_add(u.feats.rows);
        std::lock_guard<std::mutex> lk(tri_mu);
        total_ll += ll;
      });
      for (int p = 0; p < tree.n_pdfs; ++p) {
        for (int w = 1; w < threads; ++w)
          worker_accs[0][p].Merge(worker_accs[w][p]);
        UpdateGmm(worker_accs[0][p], 0.01f, &tri_pdfs[p]);
      }
      if (tri_pdfs[0].NumComps() < tri_mix_up && iter % 2 == 1)
        for (auto& g : tri_pdfs) g.Split();
      std::fprintf(stderr,
                   "tri iter %d: avg ll/frame %.3f, comps %d\n", iter,
                   total_ll / std::max(1.0, double(frames_done.load())),
                   tri_pdfs[0].NumComps());
    }
    have_tri = true;
    if (!model_path.empty()) {
      FILE* f = std::fopen((model_path + ".tri").c_str(), "wb");
      if (f) {
        WriteTree(f, tree);
        WriteGmmList(f, tri_pdfs);
        std::fclose(f);
      }
    }
  }
after_triphone:

  if (mode == "train") return 0;

  // ---- Final alignment + TextGrid export.
  std::atomic<int> aligned(0), skipped(0);
  ParallelFor(int(utts.size()), threads, [&](int i, int) {
    auto& u = utts[i];
    std::vector<AlignedSegment> segs;
    float ll;
    if (have_tri) {
      auto pdf_tab = tri_seg_pdfs(tree, u.segments);
      ll = ViterbiAlignCd(tri_pdfs, pdf_tab, u.segments, u.feats, 0.6f,
                          &segs);
    } else {
      ll = ViterbiAlign(model, u.segments, u.feats, 0.6f, &segs);
    }
    if (!std::isfinite(ll)) {
      skipped.fetch_add(1);
      return;
    }
    std::string dir = out_dir + "/" + u.speaker;
    MkDirs(dir);
    WriteTextGridFile(dir + "/" + u.basename + ".TextGrid", u, model, segs,
                      shift_s);
    aligned.fetch_add(1);
  });
  std::fprintf(stderr, "aligned %d utterances (%d skipped)\n", aligned.load(),
               skipped.load());
  return 0;
}

}  // namespace
}  // namespace efs2

int main(int argc, char** argv) { return efs2::Run(argc, argv); }
