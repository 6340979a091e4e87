#!/bin/sh
# Build the native NPZ reader -> native/libnpz_reader.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 npz_reader.cc -lz -pthread \
    -o libnpz_reader.so
echo "built $(pwd)/libnpz_reader.so"
