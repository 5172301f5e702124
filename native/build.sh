#!/bin/sh
# Build the native data-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC srn_loader.cc -lpng -lz \
    -o libsrn_loader.so
echo "built $(pwd)/libsrn_loader.so"
