#!/bin/sh
# Build the native preprocessing library (EDT + contour extraction +
# visibility culling). OpenMP when available, serial otherwise.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -fopenmp -o libf1tenth_native.so *.cpp 2>/dev/null \
  || g++ -O3 -shared -fPIC -o libf1tenth_native.so *.cpp
echo "built $(pwd)/libf1tenth_native.so"
