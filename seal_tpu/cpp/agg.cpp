// Native kernels for the evidence-aggregation hot loops.
//
// The TPU host VM is often single-core, so the per-row Python loops of the
// ranker (reference seal/keys.py:311-350 stage 1 and :397-413 stage 2)
// dominate end-to-end latency.  These kernels keep the exact sequential
// semantics:
//
//  * stage1_claim: first-come coverage claiming over corpus positions --
//    a row scores iff none of its span's positions were claimed before
//    (in row order), in which case it claims them.
//  * ac_match: Aho-Corasick multi-pattern matching of all candidate ngrams
//    over all candidate documents, emitting (doc, pattern, start) triples --
//    the same match set the reference's streaming token trie produces.

#include <algorithm>
#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// covered: byte map over corpus positions (mutated). tok_ends/doc ids per
// occurrence row of one ngram, in row order.  new_flags[i] = 1 iff row i
// claimed its span [tok_ends[i]-L, tok_ends[i]).
// Spans are pre-clamped by the caller (tok_start >= 0).
int stage1_claim(uint8_t* covered, const int64_t* tok_ends, int64_t n_rows,
                 int64_t L, uint8_t* new_flags) {
  for (int64_t i = 0; i < n_rows; ++i) {
    int64_t e = tok_ends[i];
    int64_t s = e - L;
    if (s < 0) s = 0;
    bool fresh = true;
    for (int64_t j = s; j < e; ++j) {
      if (covered[j]) {
        fresh = false;
        break;
      }
    }
    new_flags[i] = fresh ? 1 : 0;
    if (fresh) {
      for (int64_t j = s; j < e; ++j) covered[j] = 1;
    }
  }
  return 0;
}

namespace {

struct Automaton {
  // goto edges keyed by (node << 32) | symbol
  std::unordered_map<uint64_t, int32_t> next;
  std::vector<int32_t> fail;
  std::vector<int32_t> out_head;   // head of pattern-output list per node
  std::vector<int32_t> out_next;   // linked list over pattern ids
  std::vector<int32_t> out_pat;
  std::vector<int32_t> depth;

  int32_t n_nodes = 1;

  int32_t step(int32_t node, int32_t sym) const {
    while (true) {
      auto it = next.find((uint64_t(node) << 32) | uint32_t(sym));
      if (it != next.end()) return it->second;
      if (node == 0) return 0;
      node = fail[node];
    }
  }
};

}  // namespace

// Patterns and docs as concatenated int32 arrays with exclusive-end offsets
// (offsets[0] = 0).  Emits triples (doc_id, pat_id, start) into out_buf
// (capacity out_cap triples).  Returns the number of triples found (which
// may exceed out_cap -- caller re-allocates and retries; out_buf holds the
// first out_cap triples).
int64_t ac_match(const int32_t* pat_data, const int64_t* pat_off, int64_t n_pats,
                 const int32_t* doc_data, const int64_t* doc_off, int64_t n_docs,
                 int64_t* out_buf, int64_t out_cap) {
  Automaton ac;
  // --- build goto trie ---------------------------------------------------
  int64_t total_len = pat_off[n_pats];
  ac.fail.reserve(total_len + 1);
  ac.depth.reserve(total_len + 1);
  ac.fail.push_back(0);
  ac.depth.push_back(0);
  ac.out_head.push_back(-1);
  for (int64_t p = 0; p < n_pats; ++p) {
    int32_t node = 0;
    for (int64_t k = pat_off[p]; k < pat_off[p + 1]; ++k) {
      uint64_t key = (uint64_t(node) << 32) | uint32_t(pat_data[k]);
      auto it = ac.next.find(key);
      if (it == ac.next.end()) {
        int32_t nn = ac.n_nodes++;
        ac.next.emplace(key, nn);
        ac.fail.push_back(0);
        ac.depth.push_back(ac.depth[node] + 1);
        ac.out_head.push_back(-1);
        node = nn;
      } else {
        node = it->second;
      }
    }
    ac.out_pat.push_back(int32_t(p));
    ac.out_next.push_back(ac.out_head[node]);
    ac.out_head[node] = int32_t(ac.out_pat.size()) - 1;
  }
  // --- BFS fail links ----------------------------------------------------
  std::queue<int32_t> q;
  std::vector<std::pair<uint64_t, int32_t>> edges(ac.next.begin(), ac.next.end());
  // collect children per node
  std::vector<std::vector<std::pair<int32_t, int32_t>>> children(ac.n_nodes);
  for (auto& kv : edges) {
    int32_t parent = int32_t(kv.first >> 32);
    int32_t sym = int32_t(kv.first & 0xffffffffu);
    children[parent].push_back({sym, kv.second});
  }
  for (auto& [sym, child] : children[0]) {
    ac.fail[child] = 0;
    q.push(child);
  }
  while (!q.empty()) {
    int32_t node = q.front();
    q.pop();
    for (auto& [sym, child] : children[node]) {
      int32_t f = ac.step(ac.fail[node], sym);
      ac.fail[child] = f;
      // merge output lists: append f's outputs after child's
      int32_t tail = ac.out_head[child];
      if (tail == -1) {
        ac.out_head[child] = ac.out_head[f];
      } else {
        while (ac.out_next[tail] != -1) tail = ac.out_next[tail];
        ac.out_next[tail] = ac.out_head[f];
      }
      q.push(child);
    }
  }
  // --- scan documents ----------------------------------------------------
  int64_t found = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    int32_t node = 0;
    for (int64_t k = doc_off[d]; k < doc_off[d + 1]; ++k) {
      node = ac.step(node, doc_data[k]);
      for (int32_t o = ac.out_head[node]; o != -1; o = ac.out_next[o]) {
        int64_t pat = ac.out_pat[o];
        int64_t plen = pat_off[pat + 1] - pat_off[pat];
        int64_t pos_in_doc = k - doc_off[d];
        if (found < out_cap) {
          out_buf[found * 3 + 0] = d;
          out_buf[found * 3 + 1] = pat;
          out_buf[found * 3 + 2] = pos_in_doc - plen + 1;
        }
        ++found;
      }
    }
  }
  return found;
}
}
