#!/bin/sh
# Build the native preprocessing library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libf1tenth_native.so edt.cpp
echo "built $(pwd)/libf1tenth_native.so"
