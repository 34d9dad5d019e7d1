#!/bin/bash
# Definitive round-3 scaling chain: 3 interleaved samples per pinned level
# (1, 2, 4, 8, 16 cores) + one unpinnable 32-wide sample, 2M docs, seed 42.
# Interleaving spreads shared-host noise across levels instead of letting a
# noisy hour bias one level. Two N->4N pinned pairs are contention-light
# (1->4, 2->8); 4->16 additionally carries the single-socket CPU-inflation
# effect analyzed in BENCH/BASELINE.md. Writes /tmp/scale2m_l<cores>_<s>.json.
# NOTE: do not edit sources or run sbt while this chain runs (sbt lock +
# the chain recompiles the working tree).
set -u
cd /root/repo
export SPARK_DRIVER_MEM=16g
for s in a b c; do
  for spec in "1 0" "2 0-1" "4 0-3" "8 0-7" "16 0-15"; do
    set -- $spec
    cores=$1; cpus=$2
    echo "=== level $cores sample $s ($(date)) ==="
    taskset -c $cpus sbt -batch \
      "runMain graft.tools.ScalingBench level $cores 2000000 /tmp/scale2m_l${cores}_${s}.json" \
      > /tmp/scale2m_l${cores}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
echo "=== level 32 sample a ($(date)) ==="
sbt -batch \
  "runMain graft.tools.ScalingBench level 32 2000000 /tmp/scale2m_l32_a.json" \
  > /tmp/scale2m_l32_a.log 2>&1
rm -rf /tmp/graft_scale_32_*
echo "=== chain done ($(date)) ==="
