#!/bin/sh
# Build the intentbev native host library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    intentbev_host.cpp -o libintentbev_host.so
echo "built $(pwd)/libintentbev_host.so"
