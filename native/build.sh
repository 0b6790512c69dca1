#!/bin/bash
# Build the native feature loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    featloader.cpp -o libfeatloader.so
echo "built $(pwd)/libfeatloader.so"
