#!/bin/bash
# Build libisogs_native.so (marching tetrahedra + npz writer).
# Output: native/build_out/libisogs_native.so — discovered automatically by
# isogs_slam_tpu/native_ext.py.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null && command -v ninja >/dev/null; then
  cmake -S . -B build -G Ninja >/dev/null
  cmake --build build >/dev/null
else
  mkdir -p build_out
  g++ -O3 -march=native -std=c++17 -shared -fPIC \
      src/marching_tets.cpp src/npz_io.cpp src/components.cpp \
      -o build_out/libisogs_native.so
fi
echo "built native/build_out/libisogs_native.so"
