#!/bin/sh
# Build the native host-side library (marching tetrahedra + Tecplot writers).
set -e
cd "$(dirname "$0")/.."
mkdir -p lbm_ferrofluid_tpu/native
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    native/lbmnative.cpp -o lbm_ferrofluid_tpu/native/liblbmnative.so
echo "built lbm_ferrofluid_tpu/native/liblbmnative.so"
