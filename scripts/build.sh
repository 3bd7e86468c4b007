#!/usr/bin/env bash
# Build script: native extensions + wheel. The analogue of the reference's
# cross-compile script (reference: scripts/build.sh builds 9 Go targets);
# here the Python package is portable and the native pieces are built per-host.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== building native BPE merge =="
g++ -O3 -shared -fPIC -std=c++17 native/bpe_merge.cpp -o native/libbpe_merge.so
echo "built native/libbpe_merge.so"

echo "== building native block pool =="
g++ -O3 -shared -fPIC -std=c++17 native/block_pool.cpp -o native/libblock_pool.so
echo "built native/libblock_pool.so"

if [ "${1:-}" = "wheel" ]; then
  echo "== building wheel =="
  python -m pip wheel --no-deps -w dist .
fi
echo "done"
