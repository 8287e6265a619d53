#!/bin/sh
# Build the plslam native IO library (C++, zlib only).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libplslam_io.so dataloader.cpp -lz
echo "built $(pwd)/libplslam_io.so"
