#!/bin/sh
# Build the native runtime with AddressSanitizer + UBSan and run the
# native test suites against it (the reference runs its fuzzer under
# sanitizers; this is our equivalent). Usage: sh tools/build_native_asan.sh
set -e
DIR=$(dirname "$0")/../native
mkdir -p "$DIR/build"
g++ -O1 -g -fPIC -shared -std=c++17 -Wall \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    -o "$DIR/build/liblizard_tpu_runtime_asan.so" "$DIR/lizard_runtime.cpp"
echo "built: $DIR/build/liblizard_tpu_runtime_asan.so"

ASAN_SO=$(g++ -print-file-name=libasan.so)
UBSAN_SO=$(g++ -print-file-name=libubsan.so)
cd "$(dirname "$0")/.."
LD_PRELOAD="$ASAN_SO $UBSAN_SO" \
    ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
    LIZARD_TPU_NATIVE_LIB="$DIR/build/liblizard_tpu_runtime_asan.so" \
    JAX_PLATFORMS=cpu \
    python -m pytest tests/test_native_runtime.py tests/test_native_encode.py \
        tests/test_fuzzer.py -q -p no:cacheprovider
echo "sanitizer suite: OK"
