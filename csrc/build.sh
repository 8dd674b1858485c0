#!/bin/sh
# Build libexoground_io.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    exoground_io.cpp -o libexoground_io.so
echo "built $(pwd)/libexoground_io.so"
