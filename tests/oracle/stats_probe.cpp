// Oracle probe for the reference's statistics layer at arbitrary scale.
// Compiles /root/reference's map_stats.hpp verbatim (with the GSL shims in
// ./gsl) and replays the binary's exact parameter chain — including the
// uint64 -> int32 referenceSize assignment (parseCmdArgs.hpp:304 into
// offset_t, map_parameters.hpp:41) that wraps for references >= 2 GiB and
// re-converts to ~1.8e19 uint64 inside recommendedSketchSize
// (map_stats.hpp:234-258). Used by tests/test_stats.py to pin our
// sketch-size selection across the 2^31 boundary.
//
// Usage:
//   stats_probe sketch <refBytes> <k> <segLength> <identity>
//       -> prints the sketch size the stock binary would auto-select
//   stats_probe sketch_nowrap <refBytes> <k> <segLength> <identity>
//       -> same but without the int32 wrap (the "honest" value)
//   stats_probe pvalue <s> <k> <segLength> <identity> <refBytes> <wrap01>
//       -> prints estimate_pvalue (%.17g)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include "map/include/map_stats.hpp"

namespace {
typedef int32_t offset_t;  // base_types.hpp:18-22 without LARGE_CONTIG

uint64_t chain_refsize(uint64_t bytes, bool wrap) {
  if (!wrap) return bytes;
  offset_t as_offset = (offset_t)bytes;  // parseCmdArgs.hpp:304
  return (uint64_t)as_offset;            // map_stats.hpp:241 param conv
}
}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) return 2;
  const double pval_cutoff = 1e-3;      // map_parameters.hpp:92
  const float ci = 0.95f;               // map_parameters.hpp:94
  const int alphabet = 4;
  if (!strcmp(argv[1], "sketch") || !strcmp(argv[1], "sketch_nowrap")) {
    if (argc != 6) return 2;
    uint64_t bytes = strtoull(argv[2], nullptr, 10);
    int k = atoi(argv[3]);
    int64_t seg = atoll(argv[4]);
    float identity = (float)atof(argv[5]);
    uint64_t eff = chain_refsize(bytes, !strcmp(argv[1], "sketch"));
    int64_t s = skch::Stat::recommendedSketchSize(
        pval_cutoff, ci, k, alphabet, identity, seg, eff);
    printf("%lld\n", (long long)s);
    return 0;
  }
  if (!strcmp(argv[1], "pvalue")) {
    if (argc != 8) return 2;
    int s = atoi(argv[2]);
    int k = atoi(argv[3]);
    int64_t seg = atoll(argv[4]);
    float identity = (float)atof(argv[5]);
    uint64_t bytes = strtoull(argv[6], nullptr, 10);
    bool wrap = atoi(argv[7]) != 0;
    double pv = skch::Stat::estimate_pvalue(
        s, k, alphabet, identity, seg - k, chain_refsize(bytes, wrap), ci);
    printf("%.17g\n", pv);
    return 0;
  }
  return 2;
}
