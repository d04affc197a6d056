#!/usr/bin/env bash
# Build the native data loader (C ABI shared library, consumed via ctypes).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cpp -o libitir_loader.so -ljpeg -lpng -lpthread
echo "built native/libitir_loader.so"
