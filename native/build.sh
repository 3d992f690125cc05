#!/usr/bin/env bash
# Build the native data-path library into the package.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../interpolated_diffusion_tpu/data/libmaze_native.so maze_gen.cpp
echo "built interpolated_diffusion_tpu/data/libmaze_native.so"
g++ -O3 -std=c++17 -shared -fPIC -o ../interpolated_diffusion_tpu/data/libtar_native.so tar_reader.cpp
echo "built interpolated_diffusion_tpu/data/libtar_native.so"
