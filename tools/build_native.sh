#!/bin/sh
# Build the lizard_tpu native host runtime (C++). Artifacts in native/build/.
set -e
DIR=$(dirname "$0")/../native
mkdir -p "$DIR/build"
g++ -O3 -fPIC -shared -std=c++17 -Wall -o "$DIR/build/liblizard_tpu_runtime.so" "$DIR/lizard_runtime.cpp"
echo "OK: $DIR/build/liblizard_tpu_runtime.so"
