#include "tree.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <numeric>

namespace efs2 {

namespace {

constexpr double kVarFloor = 1e-2;
constexpr double kLog2Pi = 1.8378770664093453;

// Aggregated single-Gaussian stats and their optimal log-likelihood
// (up to the constant -0.5*count*dim): LL = -0.5*n*(log2pi*D + sum log var + D).
struct Agg {
  double count = 0;
  std::vector<double> sum, sum2;

  void Resize(int dim) {
    sum.assign(dim, 0.0);
    sum2.assign(dim, 0.0);
    count = 0;
  }
  void Add(const ContextStats& c) {
    count += c.count;
    for (size_t d = 0; d < sum.size(); ++d) {
      sum[d] += c.sum[d];
      sum2[d] += c.sum2[d];
    }
  }
  double LogLike() const {
    if (count <= 0) return 0.0;
    const int dim = int(sum.size());
    double logdet = 0;
    for (int d = 0; d < dim; ++d) {
      double mean = sum[d] / count;
      double var = std::max(sum2[d] / count - mean * mean, kVarFloor);
      logdet += std::log(var);
    }
    return -0.5 * count * (kLog2Pi * dim + logdet + dim);
  }
};

}  // namespace

int TriphoneTree::Lookup(int phone, int state, int left, int right) const {
  const int states = int(trees.size()) / std::max(n_phones, 1);
  const auto& tr = trees[size_t(phone) * states + state];
  int node = 0;
  while (tr[node].question >= 0) {
    int ctx = tr[node].side == 0 ? left : right;
    const auto& q = questions[tr[node].question];
    bool yes = std::binary_search(q.begin(), q.end(), ctx);
    node = yes ? tr[node].yes : tr[node].no;
  }
  return tr[node].pdf;
}

std::vector<std::vector<int>> GenerateQuestions(
    const std::vector<std::vector<float>>& phone_means) {
  const int n = int(phone_means.size());
  std::vector<std::vector<int>> clusters(n);
  std::vector<std::vector<double>> cent(n);
  std::vector<double> weight(n, 1.0);
  std::vector<char> alive(n, 1);
  for (int i = 0; i < n; ++i) {
    clusters[i] = {i};
    cent[i].assign(phone_means[i].begin(), phone_means[i].end());
  }
  std::vector<std::vector<int>> questions;
  for (int i = 0; i < n; ++i) questions.push_back({i});  // singletons

  auto dist2 = [&](int a, int b) {
    double s = 0;
    for (size_t d = 0; d < cent[a].size(); ++d) {
      double diff = cent[a][d] - cent[b][d];
      s += diff * diff;
    }
    return s;
  };

  int n_alive = n;
  while (n_alive > 1) {
    double best = std::numeric_limits<double>::infinity();
    int bi = -1, bj = -1;
    for (int i = 0; i < n; ++i) {
      if (!alive[i]) continue;
      for (int j = i + 1; j < n; ++j) {
        if (!alive[j]) continue;
        double d = dist2(i, j);
        if (d < best) { best = d; bi = i; bj = j; }
      }
    }
    // Merge bj into bi (weighted centroid), record the merged set.
    double wi = weight[bi], wj = weight[bj];
    for (size_t d = 0; d < cent[bi].size(); ++d)
      cent[bi][d] = (cent[bi][d] * wi + cent[bj][d] * wj) / (wi + wj);
    weight[bi] = wi + wj;
    clusters[bi].insert(clusters[bi].end(), clusters[bj].begin(),
                        clusters[bj].end());
    std::sort(clusters[bi].begin(), clusters[bi].end());
    alive[bj] = 0;
    --n_alive;
    if (n_alive > 1)  // the full set is a useless question
      questions.push_back(clusters[bi]);
  }
  return questions;
}

TriphoneTree BuildTree(int n_phones, int states_per_phone, int dim,
                       const std::vector<std::vector<ContextStats>>& stats,
                       const std::vector<char>& ctx_independent,
                       const std::vector<std::vector<int>>& questions,
                       const TriphoneBuildOptions& opts,
                       std::vector<DiagGmm>* leaf_gmms) {
  TriphoneTree tree;
  tree.n_phones = n_phones;
  tree.questions = questions;
  tree.trees.resize(size_t(n_phones) * states_per_phone);
  leaf_gmms->clear();

  auto make_leaf_gmm = [&](const Agg& a) {
    DiagGmm g;
    std::vector<float> mean(dim), var(dim);
    for (int d = 0; d < dim; ++d) {
      double m = a.count > 0 ? a.sum[d] / a.count : 0.0;
      double v = a.count > 0
                     ? std::max(a.sum2[d] / a.count - m * m, kVarFloor)
                     : 1.0;
      mean[d] = float(m);
      var[d] = float(v);
    }
    g.Init(dim, mean.data(), var.data());
    return g;
  };

  // Greedy splitting per root; a global budget bounds total leaves.
  int leaves_left = opts.max_leaves -
                    n_phones * states_per_phone;  // every root gets >= 1
  for (int root = 0; root < int(tree.trees.size()); ++root) {
    const int phone = root / states_per_phone;
    auto& tr = tree.trees[root];
    const auto& ctxs = stats[root];

    Agg all;
    all.Resize(dim);
    for (const auto& c : ctxs) all.Add(c);

    tr.push_back(TreeNode{});  // root
    if (ctx_independent[phone] || ctxs.size() <= 1 ||
        all.count < 2 * opts.min_count) {
      tr[0].pdf = tree.n_pdfs++;
      leaf_gmms->push_back(make_leaf_gmm(all));
      continue;
    }

    // Leaf worklist: node index + its context-entry indices.
    struct Leaf {
      int node;
      std::vector<int> ctx_ids;
    };
    std::vector<Leaf> work;
    {
      std::vector<int> ids(ctxs.size());
      std::iota(ids.begin(), ids.end(), 0);
      work.push_back({0, std::move(ids)});
    }

    std::vector<Leaf> done;
    while (!work.empty()) {
      Leaf leaf = std::move(work.back());
      work.pop_back();

      Agg parent;
      parent.Resize(dim);
      for (int id : leaf.ctx_ids) parent.Add(ctxs[id]);
      double parent_ll = parent.LogLike();

      double best_gain = opts.min_gain;
      int best_q = -1, best_side = 0;
      if (leaves_left > 0 && parent.count >= 2 * opts.min_count) {
        for (int side = 0; side < 2; ++side) {
          for (int q = 0; q < int(questions.size()); ++q) {
            Agg yes, no;
            yes.Resize(dim);
            no.Resize(dim);
            for (int id : leaf.ctx_ids) {
              int ctx = side == 0 ? ctxs[id].left : ctxs[id].right;
              bool in = std::binary_search(questions[q].begin(),
                                           questions[q].end(), ctx);
              (in ? yes : no).Add(ctxs[id]);
            }
            if (yes.count < opts.min_count || no.count < opts.min_count)
              continue;
            double gain = yes.LogLike() + no.LogLike() - parent_ll;
            if (gain > best_gain) {
              best_gain = gain;
              best_q = q;
              best_side = side;
            }
          }
        }
      }

      if (best_q < 0) {
        done.push_back(std::move(leaf));
        continue;
      }
      // Split.
      Leaf yes_leaf, no_leaf;
      for (int id : leaf.ctx_ids) {
        int ctx = best_side == 0 ? ctxs[id].left : ctxs[id].right;
        bool in = std::binary_search(questions[best_q].begin(),
                                     questions[best_q].end(), ctx);
        (in ? yes_leaf : no_leaf).ctx_ids.push_back(id);
      }
      tr[leaf.node].side = best_side;
      tr[leaf.node].question = best_q;
      tr[leaf.node].yes = int(tr.size());
      tr.push_back(TreeNode{});
      tr[leaf.node].no = int(tr.size());
      tr.push_back(TreeNode{});
      yes_leaf.node = tr[leaf.node].yes;
      no_leaf.node = tr[leaf.node].no;
      --leaves_left;
      work.push_back(std::move(yes_leaf));
      work.push_back(std::move(no_leaf));
    }

    for (auto& leaf : done) {
      Agg a;
      a.Resize(dim);
      for (int id : leaf.ctx_ids) a.Add(ctxs[id]);
      tr[leaf.node].pdf = tree.n_pdfs++;
      leaf_gmms->push_back(make_leaf_gmm(a));
    }
  }
  return tree;
}

void WriteTree(std::FILE* f, const TriphoneTree& tree) {
  std::fwrite("EFS2TR01", 1, 8, f);
  uint32_t np = tree.n_phones, nq = tree.questions.size(),
           nt = tree.trees.size(), npdf = tree.n_pdfs;
  std::fwrite(&np, 4, 1, f);
  std::fwrite(&npdf, 4, 1, f);
  std::fwrite(&nq, 4, 1, f);
  for (const auto& q : tree.questions) {
    uint32_t n = q.size();
    std::fwrite(&n, 4, 1, f);
    std::fwrite(q.data(), 4, n, f);
  }
  std::fwrite(&nt, 4, 1, f);
  for (const auto& tr : tree.trees) {
    uint32_t n = tr.size();
    std::fwrite(&n, 4, 1, f);
    for (const auto& nd : tr) {
      int32_t v[5] = {nd.side, nd.question, nd.yes, nd.no, nd.pdf};
      std::fwrite(v, 4, 5, f);
    }
  }
}

bool ReadTree(std::FILE* f, TriphoneTree* tree) {
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "EFS2TR01", 8))
    return false;
  uint32_t np = 0, npdf = 0, nq = 0, nt = 0;
  if (std::fread(&np, 4, 1, f) != 1 || std::fread(&npdf, 4, 1, f) != 1 ||
      std::fread(&nq, 4, 1, f) != 1)
    return false;
  tree->n_phones = np;
  tree->n_pdfs = npdf;
  tree->questions.resize(nq);
  for (auto& q : tree->questions) {
    uint32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) return false;
    q.resize(n);
    if (n && std::fread(q.data(), 4, n, f) != n) return false;
  }
  if (std::fread(&nt, 4, 1, f) != 1) return false;
  tree->trees.resize(nt);
  for (auto& tr : tree->trees) {
    uint32_t n = 0;
    if (std::fread(&n, 4, 1, f) != 1) return false;
    tr.resize(n);
    for (auto& nd : tr) {
      int32_t v[5];
      if (std::fread(v, 4, 5, f) != 5) return false;
      nd.side = v[0];
      nd.question = v[1];
      nd.yes = v[2];
      nd.no = v[3];
      nd.pdf = v[4];
    }
  }
  return true;
}

}  // namespace efs2
