#!/bin/sh
# Build libkzg_native.so. Run from the repo root or native/.
set -e
cd "$(dirname "$0")"
python gen_constants.py > constants.h
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libkzg_native.so kzg_native.cpp
echo "built native/libkzg_native.so"
