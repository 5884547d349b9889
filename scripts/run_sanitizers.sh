#!/bin/bash
# Build the native kernels with AddressSanitizer + UBSan and run the
# randomized self-test harness (seal_tpu/cpp/sanitize_main.cpp).
# The kernels are single-threaded by design, so ASan/UBSan cover the
# memory-safety surface; there is nothing for TSan to check (the reference's
# shared-buffer race hazard, fm_index.cpp:38-40, has no equivalent here).
set -euo pipefail
cd "$(dirname "$0")/.."
BUILD=seal_tpu/cpp/_build
mkdir -p "$BUILD"
g++ -std=c++17 -g -O1 -fsanitize=address,undefined -fno-omit-frame-pointer \
    -o "$BUILD/sanitize_test" \
    seal_tpu/cpp/sanitize_main.cpp seal_tpu/cpp/sais.cpp seal_tpu/cpp/agg.cpp
ASAN_OPTIONS=detect_leaks=1 UBSAN_OPTIONS=halt_on_error=1,print_stacktrace=1 \
    "$BUILD/sanitize_test"
