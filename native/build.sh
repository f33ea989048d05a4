#!/bin/sh
# Build the native extension into the package directory.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O2 -shared -fPIC -std=c++17 -I"$PYINC" \
    cmvs_pmvs_native.cpp -o "../cmvs_pmvs_tpu/_native$EXT"
echo "built cmvs_pmvs_tpu/_native$EXT"
# CPU-baseline microbench (BASELINE.md): reference hot-loop work profile
g++ -O3 -march=native -funroll-loops -std=c++17 -pthread \
    cpu_baseline.cpp -o cpu_baseline
echo "built native/cpu_baseline"
