#!/bin/sh
# Build the native data-ops library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libdataops.so dataops.cpp
echo "built $(pwd)/libdataops.so"
