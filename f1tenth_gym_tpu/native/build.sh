#!/bin/sh
# Build the native preprocessing library (EDT + contour extraction).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libf1tenth_native.so *.cpp
echo "built $(pwd)/libf1tenth_native.so"
