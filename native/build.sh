#!/bin/sh
# Build the first-party native runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -pthread -o libdeepstaple_io.so deepstaple_native.cpp -lz
echo "built native/libdeepstaple_io.so"
