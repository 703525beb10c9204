#!/bin/bash
# Runs the pending device work as soon as the axon tunnel answers.
# Probes with a short-timeout trivial op; on success runs, in order:
#   1. block-tail device check (numerics + layer timing)
#   2. full flagship bench --breakdown  (headline number at HEAD)
#   3. one B=16384 bench data point (fixed-cost amortization)
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

for i in $(seq 1 200); do
  if timeout 70 python -c "import jax, jax.numpy as jnp; print(jnp.ones(8).sum())" >/dev/null 2>&1; then
    echo "=== tunnel up after probe $i @ $(date -u +%H:%M:%S) ==="
    break
  fi
  echo "probe $i: down @ $(date -u +%H:%M:%S)"
  sleep 240
done

echo "=== 1. block-tail device check ==="
timeout 2400 python exp/block_tail_device_check.py 2>&1 | grep -v WARNING | tail -5

echo "=== 2. flagship bench (B=8192, breakdown) ==="
timeout 3600 python bench.py --profile /tmp/bench_trace_r2f --breakdown 2>&1 | tail -12

echo "=== 3. B=16384 bench ==="
timeout 3600 python bench.py --batch 16384 2>&1 | tail -3
