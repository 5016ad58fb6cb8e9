#!/bin/bash
# TPU A/B sweep: one config per process (lease-safe), 300s gaps.
set -u
for cfg in tp_sqrt tp_1x tp_linear parity; do
  echo "=== $cfg $(date)"
  AB_TPU=1 python tools/ab_throughput.py "$cfg"
  echo "=== $cfg done rc=$? $(date)"
  sleep 300
done
