#!/bin/bash
# Build the native loader library -> native/libwmtar.so
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -pthread tar_reader.cpp -o libwmtar.so
echo "built $(pwd)/libwmtar.so"
