#!/bin/bash
# Definitive round-3 scaling chain: 3 interleaved samples per pinned level
# (2, 4, 8, 16 cores) + 2 unpinnable 32-wide samples, 2M docs, seed 42.
# Interleaving spreads shared-host noise across levels instead of letting a
# noisy hour bias one level. Writes /tmp/scale2m_l<cores>_<s>.json.
# NOTE: do not edit sources or run sbt while this chain runs (sbt lock +
# the chain recompiles the working tree).
set -u
cd /root/repo
export SPARK_DRIVER_MEM=16g
for s in a b c; do
  for spec in "2 0-1" "4 0-3" "8 0-7" "16 0-15"; do
    set -- $spec
    cores=$1; cpus=$2
    echo "=== level $cores sample $s ($(date)) ==="
    taskset -c $cpus sbt -batch \
      "runMain graft.tools.ScalingBench level $cores 2000000 /tmp/scale2m_l${cores}_${s}.json" \
      > /tmp/scale2m_l${cores}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
for s in a b; do
  echo "=== level 32 sample $s ($(date)) ==="
  sbt -batch \
    "runMain graft.tools.ScalingBench level 32 2000000 /tmp/scale2m_l32_${s}.json" \
    > /tmp/scale2m_l32_${s}.log 2>&1
  rm -rf /tmp/graft_scale_32_*
done
echo "=== chain done ($(date)) ==="
