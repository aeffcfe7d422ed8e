// Exact replay of the reference's unstable combine sort.
//
// combineTaxonomies (reference MetagenomicResults.h:149-176) sorts the
// per-read IdentifiedTaxonomy rows by taxonomyID with __gnu_parallel::sort
// under force_parallel settings (ParallelTools.h:38-42), then drops the
// very first row of the sorted array (the `tax == begin` skip with
// testTaxID starting at 0).  The sort is UNSTABLE, so which row among the
// smallest-taxID ties is lost depends on libstdc++'s sort internals.
//
// Comparison sorts are value-oblivious: the permutation depends only on
// comparator outcomes and element count.  Running the same libstdc++
// __gnu_parallel::sort on (key, index) pairs with a key-only comparator
// therefore reproduces the reference binary's permutation bit-exactly on
// the same machine/toolchain (thread count included, since both inherit
// the same OMP defaults).  kslam_tpu/pipeline/classify.py uses perm[0] to
// pick the same quirk victim as the reference; without this library it
// falls back to a stable sort (documented delta).

#include <parallel/algorithm>
#include <cstdint>
#include <vector>

namespace {
struct Row {
  uint32_t key;
  int32_t idx;
};
}  // namespace

extern "C" void kslam_ref_sort_perm(const uint32_t *keys, int64_t n,
                                    int32_t *perm_out) {
  __gnu_parallel::_Settings s;
  s.algorithm_strategy = __gnu_parallel::force_parallel;
  __gnu_parallel::_Settings::set(s);
  std::vector<Row> rows(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    rows[static_cast<size_t>(i)].key = keys[i];
    rows[static_cast<size_t>(i)].idx = static_cast<int32_t>(i);
  }
  __gnu_parallel::sort(rows.begin(), rows.end(),
                       [](const Row &a, const Row &b) {
    return a.key < b.key;
  });
  for (int64_t i = 0; i < n; ++i)
    perm_out[i] = rows[static_cast<size_t>(i)].idx;
}
