#!/bin/bash
# Round-5 re-evidence of the north rule's N->4N pairs ON ROUND-5 CODE:
# 3 interleaved samples per pinned level (1, 2, 4, 8 cores), 2M docs,
# seed 42 — same methodology as rounds 3/4 (tools/scale_chain.sh). The
# contention-light pairs (1->4, 2->8) are this sandbox's faithful stand-in
# for N vs 4N executors (BENCH/BASELINE.md); the 4->16 hardware attribution
# is closed and not re-measured. Writes /tmp/scale2m_r5_l<cores>_<s>.json.
# NOTE: do not edit sources or run sbt while this chain runs (sbt lock +
# the chain recompiles the working tree).
set -u
cd /root/repo
export SPARK_DRIVER_MEM=16g
for s in a b c; do
  for spec in "1 0" "2 0-1" "4 0-3" "8 0-7"; do
    set -- $spec
    cores=$1; cpus=$2
    echo "=== level $cores sample $s ($(date)) ==="
    taskset -c $cpus sbt -batch \
      "runMain graft.tools.ScalingBench level $cores 2000000 /tmp/scale2m_r5_l${cores}_${s}.json" \
      > /tmp/scale2m_r5_l${cores}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
echo "=== r5 chain done ($(date)) ==="
