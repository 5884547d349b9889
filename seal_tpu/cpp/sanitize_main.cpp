// Sanitizer harness for the native kernels (sais.cpp, agg.cpp).
//
// Built and run by scripts/run_sanitizers.sh with
// -fsanitize=address,undefined: randomized inputs sweep every extern "C"
// entry point, with brute-force oracles where cheap (suffix order, multi-
// pattern matching).  The kernels are single-threaded by design (the
// reference's thread-safety hazard -- shared wavelet buffers in
// fm_index.cpp:38-40 -- has no equivalent here), so ASan/UBSan cover the
// memory-safety surface; there is nothing for TSan to check.

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
int sais_i32(const int32_t* T, int64_t n, int64_t K, int64_t* SA);
int stage1_claim(uint8_t* covered, const int64_t* tok_ends, int64_t n_rows,
                 int64_t L, uint8_t* new_flags);
int64_t stage1_accumulate(const int32_t* pat_data, const int64_t* pat_off,
                          const double* sco, const double* prim,
                          int64_t n_ngrams, const int64_t* row_off,
                          const int64_t* tok_ends, const int64_t* doc_ids,
                          uint8_t* covered, double beta, double init_best_prim,
                          int32_t allow_overlaps, int64_t max_token,
                          int64_t* out_docs, double* out_scores,
                          double* out_best);
int ranges_multi(const int32_t* psi, const int64_t* C, int64_t sigma,
                 const int32_t* seq_data, const int64_t* seq_off,
                 int64_t n_seqs, int64_t n_rows, int64_t* out_lo,
                 int64_t* out_hi);
int64_t stage2_score(const int32_t* pat_data, const int64_t* pat_off,
                     const double* pat_sco, const double* pat_prim,
                     int64_t n_pats, const int32_t* doc_data,
                     const int64_t* doc_off, int64_t n_docs,
                     const int64_t* triples, int64_t n_triples,
                     const double* unigram_scores, int64_t n_unigram,
                     double beta, double init_best_prim, int32_t allow_overlaps,
                     int32_t unigrams_ignore_free_places, int64_t max_token,
                     double* out_multi, double* out_single_best,
                     int64_t* out_single_pat, double* out_unigram,
                     int64_t* found_off, int64_t* found_id, double* found_sco);
int64_t ac_match(const int32_t* pat_data, const int64_t* pat_off,
                 int64_t n_pats, const int32_t* doc_data,
                 const int64_t* doc_off, int64_t n_docs, int64_t* out_buf,
                 int64_t out_cap);
}

namespace {

std::mt19937_64 rng(0xC0FFEE);

int64_t randint(int64_t lo, int64_t hi) {  // inclusive
  return lo + int64_t(rng() % uint64_t(hi - lo + 1));
}

#define CHECK(cond, msg)                                          \
  do {                                                            \
    if (!(cond)) {                                                \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, msg); \
      std::exit(1);                                               \
    }                                                             \
  } while (0)

// ---- sais: suffix array vs brute-force sort ------------------------------
void test_sais() {
  for (int64_t n : {int64_t(0), int64_t(1), int64_t(2), int64_t(16),
                    int64_t(300), int64_t(2000)}) {
    for (int64_t sigma : {int64_t(1), int64_t(2), int64_t(5), int64_t(100)}) {
      // contract (suffix_array.py / native.py): body symbols >= 1 plus a
      // unique trailing 0 sentinel
      std::vector<int32_t> t(static_cast<size_t>(n));
      for (auto& x : t) x = int32_t(randint(1, sigma));
      if (n > 0) t.back() = 0;
      std::vector<int64_t> sa(size_t(n), -1);
      int rc = sais_i32(t.data(), n, sigma, sa.data());
      if (n == 0) {  // contract: empty input is rejected, not processed
        CHECK(rc != 0, "sais must reject n=0");
        continue;
      }
      CHECK(rc == 0, "sais rc");
      std::vector<int64_t> ref(static_cast<size_t>(n));
      for (int64_t i = 0; i < n; ++i) ref[size_t(i)] = i;
      std::sort(ref.begin(), ref.end(), [&](int64_t a, int64_t b) {
        return std::lexicographical_compare(t.begin() + a, t.end(),
                                            t.begin() + b, t.end());
      });
      CHECK(sa == ref, "sais order mismatch");
    }
  }
  // large smoke (no oracle): memory errors are what ASan watches for
  std::vector<int32_t> big(200000);
  for (auto& x : big) x = int32_t(randint(1, 999));
  big.back() = 0;
  std::vector<int64_t> sa(big.size());
  CHECK(sais_i32(big.data(), int64_t(big.size()), 999, sa.data()) == 0,
        "sais big rc");
}

// ---- ac_match vs brute force ----------------------------------------------
struct Flat {
  std::vector<int32_t> data;
  std::vector<int64_t> off{0};
  void push(const std::vector<int32_t>& s) {
    data.insert(data.end(), s.begin(), s.end());
    off.push_back(int64_t(data.size()));
  }
  int64_t count() const { return int64_t(off.size()) - 1; }
};

void test_ac_match() {
  for (int round = 0; round < 20; ++round) {
    int64_t sigma = randint(2, 6);
    Flat pats, docs;
    int64_t n_pats = randint(1, 12);
    for (int64_t p = 0; p < n_pats; ++p) {
      std::vector<int32_t> s(size_t(randint(1, 4)));
      for (auto& x : s) x = int32_t(randint(0, sigma - 1));
      pats.push(s);
    }
    int64_t n_docs = randint(1, 8);
    for (int64_t d = 0; d < n_docs; ++d) {
      std::vector<int32_t> s(size_t(randint(0, 40)));
      for (auto& x : s) x = int32_t(randint(0, sigma - 1));
      docs.push(s);
    }
    // brute force triple set
    std::vector<std::array<int64_t, 3>> want;
    for (int64_t d = 0; d < n_docs; ++d) {
      int64_t dlen = docs.off[d + 1] - docs.off[d];
      const int32_t* dt = docs.data.data() + docs.off[d];
      for (int64_t p = 0; p < n_pats; ++p) {
        int64_t plen = pats.off[p + 1] - pats.off[p];
        const int32_t* pt = pats.data.data() + pats.off[p];
        for (int64_t i = 0; i + plen <= dlen; ++i) {
          if (std::equal(pt, pt + plen, dt + i)) want.push_back({d, p, i});
        }
      }
    }
    // first call with a deliberately tiny buffer exercises the retry path
    std::vector<int64_t> buf(3);
    int64_t found = ac_match(pats.data.data(), pats.off.data(), n_pats,
                             docs.data.data(), docs.off.data(), n_docs,
                             buf.data(), 1);
    CHECK(found == int64_t(want.size()), "ac_match count (tiny cap)");
    buf.assign(size_t(found ? found * 3 : 3), -1);
    found = ac_match(pats.data.data(), pats.off.data(), n_pats,
                     docs.data.data(), docs.off.data(), n_docs, buf.data(),
                     found);
    CHECK(found == int64_t(want.size()), "ac_match count");
    std::vector<std::array<int64_t, 3>> got;
    for (int64_t i = 0; i < found; ++i)
      got.push_back({buf[size_t(i * 3)], buf[size_t(i * 3 + 1)], buf[size_t(i * 3 + 2)]});
    std::sort(got.begin(), got.end());
    std::sort(want.begin(), want.end());
    CHECK(got == want, "ac_match triples mismatch");
  }
}

// ---- ranges_multi over a synthetic Psi layout ------------------------------
void test_ranges_multi() {
  for (int round = 0; round < 10; ++round) {
    int64_t sigma = randint(2, 8);
    int64_t n_rows = randint(4, 60);
    // per-symbol sorted row blocks that partition [0, n_rows)
    std::vector<int64_t> C(size_t(sigma + 1), 0);
    std::vector<int64_t> cuts;
    for (int64_t c = 1; c < sigma; ++c) cuts.push_back(randint(0, n_rows));
    std::sort(cuts.begin(), cuts.end());
    for (int64_t c = 1; c < sigma; ++c) C[size_t(c)] = cuts[size_t(c - 1)];
    C[size_t(sigma)] = n_rows;
    std::vector<int32_t> psi(static_cast<size_t>(n_rows));
    for (int64_t c = 0; c < sigma; ++c) {
      for (int64_t i = C[size_t(c)]; i < C[size_t(c + 1)]; ++i)
        psi[size_t(i)] = int32_t(randint(0, n_rows));
      std::sort(psi.begin() + C[size_t(c)], psi.begin() + C[size_t(c + 1)]);
    }
    Flat seqs;
    for (int64_t s = 0; s < 8; ++s) {
      std::vector<int32_t> q(size_t(randint(0, 5)));
      // include out-of-range symbols to exercise the guard
      for (auto& x : q) x = int32_t(randint(-1, sigma));
      seqs.push({q});
    }
    std::vector<int64_t> lo(8), hi(8);
    CHECK(ranges_multi(psi.data(), C.data(), sigma, seqs.data.data(),
                       seqs.off.data(), 8, n_rows, lo.data(), hi.data()) == 0,
          "ranges_multi rc");
    for (int64_t s = 0; s < 8; ++s) {
      CHECK(lo[size_t(s)] >= 0 && hi[size_t(s)] <= n_rows && lo[size_t(s)] <= hi[size_t(s)],
            "ranges_multi bounds");
    }
  }
}

// ---- stage1 + stage2 over ac_match output ----------------------------------
void test_stages() {
  for (int round = 0; round < 10; ++round) {
    int64_t sigma = randint(3, 10);
    Flat pats, docs;
    int64_t n_pats = randint(1, 10);
    std::vector<double> sco(static_cast<size_t>(n_pats)), prim(size_t(n_pats), 0.0);
    for (int64_t p = 0; p < n_pats; ++p) {
      std::vector<int32_t> s(size_t(randint(1, 4)));
      for (auto& x : s) x = int32_t(randint(0, sigma - 1));
      pats.push(s);
      sco[size_t(p)] = double(randint(0, 100)) / 10.0;
    }
    int64_t n_docs = randint(1, 6);
    int64_t total_doc = 0;
    for (int64_t d = 0; d < n_docs; ++d) {
      std::vector<int32_t> s(size_t(randint(1, 30)));
      for (auto& x : s) x = int32_t(randint(0, sigma - 1));
      docs.push(s);
      total_doc += int64_t(s.size());
    }

    // stage1: synthetic occurrence rows over a flat corpus of the docs
    std::vector<int64_t> row_off{0}, tok_ends, doc_ids;
    for (int64_t p = 0; p < n_pats; ++p) {
      int64_t rows = randint(0, 6);
      for (int64_t r = 0; r < rows; ++r) {
        int64_t d = randint(0, n_docs - 1);
        int64_t dlen = docs.off[d + 1] - docs.off[d];
        tok_ends.push_back(docs.off[d] + randint(1, dlen));
        doc_ids.push_back(d);
      }
      row_off.push_back(int64_t(tok_ends.size()));
    }
    std::vector<uint8_t> covered(static_cast<size_t>(total_doc), 0);
    std::vector<int64_t> out_docs(static_cast<size_t>(n_docs));
    std::vector<double> out_scores(static_cast<size_t>(n_docs)), out_best(static_cast<size_t>(n_docs));
    int64_t nd = stage1_accumulate(
        pats.data.data(), pats.off.data(), sco.data(), prim.data(), n_pats,
        row_off.data(), tok_ends.data(), doc_ids.data(), covered.data(), 0.8,
        0.0, 0, sigma, out_docs.data(), out_scores.data(), out_best.data());
    CHECK(nd >= 0 && nd <= n_docs, "stage1 doc count");

    // stage1_claim standalone
    if (!tok_ends.empty()) {
      std::vector<uint8_t> cov2(size_t(total_doc), 0), flags(tok_ends.size(), 0);
      CHECK(stage1_claim(cov2.data(), tok_ends.data(),
                         int64_t(tok_ends.size()), 2, flags.data()) == 0,
            "stage1_claim rc");
    }

    // stage2 fed by real ac_match triples
    int64_t cap = 1;
    std::vector<int64_t> triples(size_t(cap * 3));
    int64_t nt = ac_match(pats.data.data(), pats.off.data(), n_pats,
                          docs.data.data(), docs.off.data(), n_docs,
                          triples.data(), cap);
    triples.assign(size_t(std::max<int64_t>(nt, 1) * 3), 0);
    nt = ac_match(pats.data.data(), pats.off.data(), n_pats, docs.data.data(),
                  docs.off.data(), n_docs, triples.data(), nt);
    std::vector<double> unig(static_cast<size_t>(sigma));
    for (auto& u : unig) u = double(randint(-5, 20)) / 10.0;
    int64_t fcap = nt + total_doc;
    std::vector<double> multi(static_cast<size_t>(n_docs)), single(static_cast<size_t>(n_docs)),
        uni(static_cast<size_t>(n_docs)), f_sco(size_t(std::max<int64_t>(fcap, 1)));
    std::vector<int64_t> spat(static_cast<size_t>(n_docs)), f_off(static_cast<size_t>(n_docs + 1)),
        f_id(size_t(std::max<int64_t>(fcap, 1)));
    for (int32_t flags = 0; flags < 4; ++flags) {
      int64_t found = stage2_score(
          pats.data.data(), pats.off.data(), sco.data(), prim.data(), n_pats,
          docs.data.data(), docs.off.data(), n_docs, triples.data(), nt,
          unig.data(), sigma, 0.8, 0.0, flags & 1, (flags >> 1) & 1, sigma,
          multi.data(), single.data(), spat.data(), uni.data(), f_off.data(),
          f_id.data(), f_sco.data());
      CHECK(found >= 0 && found <= fcap, "stage2 found within capacity");
      CHECK(f_off[size_t(n_docs)] == found, "stage2 offsets consistent");
    }
  }
}

}  // namespace

int main() {
  test_sais();
  test_ac_match();
  test_ranges_multi();
  test_stages();
  std::printf("sanitize_main: all native-kernel checks passed\n");
  return 0;
}
