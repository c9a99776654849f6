#!/bin/sh
# Build libckzg_tpu.so (the c-kzg-4844 drop-in C ABI) and its C test binary.
set -e
cd "$(dirname "$0")"
REPO_ROOT="$(cd .. && pwd)"
PY_INC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
PY_LIBDIR=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
PY_VER=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LDVERSION'))")
g++ -O2 -fPIC -shared -std=c++17 \
    -I"$PY_INC" \
    -DKZG_TPU_DEFAULT_ROOT="\"$REPO_ROOT\"" \
    -o libckzg_tpu.so c_abi_shim.cpp \
    -L"$PY_LIBDIR" -Wl,-rpath,"$PY_LIBDIR" -lpython"$PY_VER"
gcc -O2 -std=c11 -o test_c_abi test_c_abi.c -L. -Wl,-rpath,"$PWD" -lckzg_tpu
echo "built native/libckzg_tpu.so and native/test_c_abi"
