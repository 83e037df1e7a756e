#!/bin/bash
# Build the REFERENCE binaries (from /root/reference, read-only) as
# golden-output oracles for parity tests. Uses the GSL shims in ./gsl since
# GSL is not installed. Binaries land in /tmp/mashmap_ref/{mashmap,mashmap-align}.
# Prints the mashmap path last (callers take the last stdout line).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/mashmap_ref}
mkdir -p "$OUT"
if [ ! -x "$OUT/mashmap-align" ] || [ "$HERE/build_ref.sh" -nt "$OUT/mashmap-align" ]; then
    g++ -std=c++17 -O2 -I "$REF/src" -I "$REF/src/common" -I "$HERE" \
        -o "$OUT/mashmap-align" \
        "$REF/src/align/align.cpp" "$REF/src/common/utils.cpp" \
        -lz -lpthread 2> "$OUT/build_align.log" || {
            echo "align build failed; see $OUT/build_align.log" >&2; exit 1; }
fi
if [ ! -x "$OUT/stats_probe" ] || [ "$HERE/stats_probe.cpp" -nt "$OUT/stats_probe" ]; then
    g++ -std=c++17 -O2 -I "$REF/src" -I "$REF/src/common" -I "$HERE" \
        -o "$OUT/stats_probe" "$HERE/stats_probe.cpp" \
        2> "$OUT/build_stats_probe.log" || {
            echo "stats_probe build failed; see $OUT/build_stats_probe.log" >&2; exit 1; }
fi
if [ ! -x "$OUT/mashmap" ] || [ "$HERE/build_ref.sh" -nt "$OUT/mashmap" ]; then
    g++ -std=c++17 -O2 -I "$REF/src" -I "$REF/src/common" -I "$HERE" \
        -o "$OUT/mashmap" \
        "$REF/src/map/mash_map.cpp" "$REF/src/common/utils.cpp" \
        -lz -lpthread 2> "$OUT/build.log" || {
            echo "build failed; see $OUT/build.log" >&2; exit 1; }
fi
echo "$OUT/mashmap"
