#!/bin/bash
# Build the REFERENCE mashmap binary (from /root/reference, read-only) as a
# golden-output oracle for parity tests. Uses the GSL shims in ./gsl since
# GSL is not installed. The binary lands in /tmp/mashmap_ref/mashmap.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/mashmap_ref}
mkdir -p "$OUT"
if [ -x "$OUT/mashmap" ] && [ "$OUT/mashmap" -nt "$HERE/build_ref.sh" ]; then
    echo "$OUT/mashmap"
    exit 0
fi
g++ -std=c++17 -O2 -I "$REF/src" -I "$REF/src/common" -I "$HERE" \
    -o "$OUT/mashmap" \
    "$REF/src/map/mash_map.cpp" "$REF/src/common/utils.cpp" \
    -lz -lpthread 2> "$OUT/build.log" || {
        echo "build failed; see $OUT/build.log" >&2; exit 1; }
echo "$OUT/mashmap"
