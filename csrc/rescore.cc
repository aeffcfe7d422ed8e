// Exact pseudo-assembly chain rescoring (native host runtime).
//
// Mirrors the reference's per-chain double-precision walk
// (PairedOverlap.h:517-573): for every chain of >= 2 alignments on one
// genome entry (rows pre-sorted by entry/ref_start, chain ids from the
// device labeling in ops/screens_dev.pseudo_assembly_chains), accumulate
//   perBase     += score / |re - rs|      (inf on zero span)
//   numBases    += |re - rs|
//   highest      = max(re)
// in C++ double exactly like the reference's sequential += order, then
//   length = highest - rs[first];  cov = numBases / length;
//   val = cov * (perBase / count) * length
// and truncate to uint32 (non-finite -> 0, matching the parity-tested
// Python spec in pipeline/device_path.rescore_chains_host, which this
// function replaces at ~100x the speed -- the Python row loop was the
// phase-B wall-clock hot spot at deep-coverage chain sizes).
//
// Inputs are the SORTED-ORDER columns; valid rows form a contiguous
// prefix (the chain-labeling sort parks invalid rows at the tail), but
// this walk only assumes "chains = runs of equal cseg among valid rows".

#include <cmath>
#include <cstdint>
#include <cstdlib>

extern "C" void kslam_rescore_chains(
    const uint8_t *valid, const int32_t *cseg, const uint32_t *score,
    const int32_t *rs, const int32_t *re, int64_t n, uint32_t *out) {
  int64_t i = 0;
  while (i < n) {
    if (!valid[i]) {
      out[i] = score[i];
      ++i;
      continue;
    }
    // chain = maximal run of valid rows sharing cseg (invalid rows never
    // interrupt a run: the sort keys are (valid desc, entry, ref_start))
    int64_t j = i;
    while (j < n && valid[j] && cseg[j] == cseg[i]) ++j;
    const int64_t count = j - i;
    if (count < 2) {
      out[i] = score[i];
      i = j;
      continue;
    }
    double per_base = 0.0;
    int64_t num_bases = 0;
    int64_t highest = -1000000;
    for (int64_t k = i; k < j; ++k) {
      const int64_t d = (int64_t)re[k] - (int64_t)rs[k];
      const int64_t span64 = d < 0 ? -d : d;
      // span 0 adds literal +inf (even for score 0, where 0/0.0 would
      // be nan) -- the parity-tested host rule
      per_base += span64 ? (double)score[k] / (double)span64 : INFINITY;
      num_bases += span64;
      if ((int64_t)re[k] > highest) highest = re[k];
    }
    const double length = (double)(highest - (int64_t)rs[i]);
    // length 0: 0/0 -> nan, x/0 -> inf, exactly the host/python rule
    const double cov = (double)num_bases / length;
    const double avg = per_base / (double)count;
    const double val = cov * avg * length;
    uint32_t rescored = 0;
    if (std::isfinite(val)) rescored = (uint32_t)(__int128)val;
    for (int64_t k = i; k < j; ++k) out[k] = rescored;
    i = j;
  }
}
