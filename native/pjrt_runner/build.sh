#!/usr/bin/env bash
# Build the native PJRT runner (reference: ascend310_infer/build.sh).
set -e
cd "$(dirname "$0")"
mkdir -p out
cd out
cmake .. "$@"
cmake --build . -j"$(nproc)"
echo "built: $(pwd)/pjrt_runner"
