#!/bin/bash
# Launch the 2-process jax.distributed smoke test on the local CPU backend.
set -e
cd "$(dirname "$0")/.."
JAX_PROCESS_ID=1 python tools/multihost_smoke.py &
P1=$!
JAX_PROCESS_ID=0 python tools/multihost_smoke.py
wait $P1
echo "MULTIHOST: both processes OK"
