#!/bin/sh
# Build the first-party native runtime library.
# Optional $1: output path (used by the autobuilder to compile to a temp file
# and atomically rename into place; defaults to libdeepstaple_io.so here).
set -e
cd "$(dirname "$0")"
OUT="${1:-libdeepstaple_io.so}"
g++ -O3 -march=native -fPIC -shared -pthread -o "$OUT" deepstaple_native.cpp -lz
echo "built $OUT"
