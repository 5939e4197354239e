// Sanitizer harness for libcghost (SURVEY.md §5: the reference has no
// TSan/miri CI; the rebuild's host C++ gets an ASan+UBSan pass in
// `make ci` instead — the JAX side is functionally pure and needs none).
//
// Exercises every exported kernel with representative + edge-case inputs
// under -fsanitize=address,undefined. Asserts basic invariants; the
// Python test suite covers full semantics, this catches memory errors.
//
// Build/run: make -C native sanitize

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
int64_t cg_abi_version();
void cg_padded_adjacency(
    int64_t, const int64_t*, const int32_t*, const int16_t*, const float*,
    const int64_t*, const int32_t*, const int16_t*, const float*,
    const int16_t*, int64_t, int64_t, int32_t*, float*, int16_t*, int8_t*);
void cg_trigram_preselect(
    const char*, const int64_t*, int64_t, const char*, const int64_t*,
    int64_t, double, int64_t, int32_t*, float*);
int64_t cg_bm25_score(
    const int64_t*, const int32_t*, const int32_t*, int64_t,
    const int32_t*, int64_t, double, double, double, int64_t,
    int32_t*, float*);
int64_t cg_chunk_boundaries(
    const int32_t*, int64_t, int64_t, int64_t, int32_t*, int64_t);
void cg_ivf_spill_fill(
    const int32_t*, int64_t, int64_t, int64_t, int64_t*, int32_t*, int32_t*);
}

static void test_padded_adjacency() {
  // 3 nodes: 0->1 (calls, w1), 2->0 (uses, w2); reverse CSR mirrors.
  int64_t indptr[] = {0, 1, 1, 2};
  int32_t indices[] = {1, 0};
  int16_t etype[] = {0, 1};
  float weight[] = {1.0f, 2.0f};
  int64_t r_indptr[] = {0, 1, 2, 2};
  int32_t r_indices[] = {2, 0};
  int16_t r_etype[] = {1, 0};
  float r_weight[] = {2.0f, 1.0f};
  int16_t keep[] = {0, 1, 2};
  const int64_t max_deg = 2;
  std::vector<int32_t> nbr(3 * max_deg, -1);
  std::vector<float> wgt(3 * max_deg, 0.0f);
  std::vector<int16_t> et(3 * max_deg, -1);
  std::vector<int8_t> dir(3 * max_deg, 0);
  cg_padded_adjacency(3, indptr, indices, etype, weight, r_indptr,
                      r_indices, r_etype, r_weight, keep, 3, max_deg,
                      nbr.data(), wgt.data(), et.data(), dir.data());
  // row 0: neighbor 2 (incoming uses, w=2) ranked above 1 (outgoing call)
  assert(nbr[0] == 2 && et[0] == 1 && dir[0] == 1 && wgt[0] == 2.0f);
  assert(nbr[1] == 1 && et[1] == 0 && dir[1] == 0);
  // empty-edge node
  int64_t e0[] = {0, 0};
  std::vector<int32_t> n1(1 * max_deg, -1);
  std::vector<float> w1(1 * max_deg, 0.0f);
  std::vector<int16_t> e1(1 * max_deg, -1);
  std::vector<int8_t> d1(1 * max_deg, 0);
  cg_padded_adjacency(1, e0, nullptr, nullptr, nullptr, e0, nullptr,
                      nullptr, nullptr, keep, 3, max_deg,
                      n1.data(), w1.data(), e1.data(), d1.data());
  assert(n1[0] == -1);
  std::puts("padded_adjacency ok");
}

static void test_trigram() {
  const char* tbuf = "compute_checksumzz";
  int64_t toff[] = {0, 16, 18};
  const char* sbuf = "compute_checksumsrender_page";
  int64_t soff[] = {0, 17, 28};
  std::vector<int32_t> idx(2 * 3, -1);
  std::vector<float> score(2 * 3, 0.0f);
  cg_trigram_preselect(tbuf, toff, 2, sbuf, soff, 2, 0.2, 3,
                       idx.data(), score.data());
  assert(idx[0] == 0 && score[0] > 0.5f);
  assert(idx[3] == -1);  // "zz" matches nothing
  std::puts("trigram_preselect ok");
}

static void test_bm25() {
  // 2 terms over 3 docs
  int64_t post_off[] = {0, 2, 3};
  int32_t post_doc[] = {0, 2, 0};
  int32_t post_tf[] = {2, 1, 1};
  int32_t doc_len[] = {5, 4, 6};
  std::vector<int32_t> out_doc(10, 0);
  std::vector<float> out_score(10, 0.0f);
  int64_t n = cg_bm25_score(post_off, post_doc, post_tf, 2, doc_len, 3,
                            5.0, 1.2, 0.75, 10,
                            out_doc.data(), out_score.data());
  assert(n == 2 && out_doc[0] == 0 && out_score[0] > out_score[1]);
  // empty postings
  int64_t empty_off[] = {0, 0};
  n = cg_bm25_score(empty_off, nullptr, nullptr, 1, doc_len, 3, 5.0,
                    1.2, 0.75, 10, out_doc.data(), out_score.data());
  assert(n == 0);
  std::puts("bm25 ok");
}

static void test_chunks() {
  int32_t lines[] = {10, 10, 10, 10, 50, 10};
  std::vector<int32_t> starts(16, 0);
  int64_t n = cg_chunk_boundaries(lines, 6, 30, 10, starts.data(), 16);
  assert(n >= 2 && starts[0] == 0);
  // single over-budget line must still advance
  int32_t big[] = {100};
  n = cg_chunk_boundaries(big, 1, 30, 10, starts.data(), 16);
  assert(n == 1);
  std::puts("chunk_boundaries ok");
}

static void test_spill() {
  // 2 cells cap 2, 5 rows all first-choice cell 0 -> spills to 1, then
  // least-filled fallback
  int32_t top2[] = {0, 1, 0, 1, 0, 1, 0, 1, 0, 1};
  int64_t fill[] = {0, 0};
  std::vector<int32_t> cell(5, -1), pos(5, -1);
  cg_ivf_spill_fill(top2, 5, 2, 2, fill, cell.data(), pos.data());
  assert(fill[0] + fill[1] == 5);
  for (int j = 0; j < 5; ++j) assert(cell[j] >= 0 && pos[j] >= 0);
  std::puts("ivf_spill_fill ok");
}

int main() {
  assert(cg_abi_version() >= 2);
  test_padded_adjacency();
  test_trigram();
  test_bm25();
  test_chunks();
  test_spill();
  std::puts("cghost sanitize: ALL OK");
  return 0;
}
