#!/bin/bash
# Pre-snapshot gate (VERDICT r4 item 3: a round must never ship with a red
# default lane).  Run before ending a round / tagging a milestone:
#
#   bash scripts/preflight.sh          # default lane (~15-20 min, 1 core)
#   RUNSLOW=1 bash scripts/preflight.sh  # + the opt-in slow lane
#
# Exits non-zero on any failure.  CPU-only (8 virtual devices); never
# touches the TPU tunnel, so it can run alongside an on-chip bench.
set -e
cd "$(dirname "$0")/.."

EXTRA=""
if [ -n "$RUNSLOW" ]; then EXTRA="--runslow"; fi

JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= DIMSUM_JAX_CACHE=0 \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q $EXTRA

JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= DIMSUM_JAX_CACHE=0 \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

echo "PREFLIGHT GREEN"
