#!/bin/bash
# Round-4 quiet-window retry of the 4->16 pinned pair (VERDICT item 6):
# 3 interleaved samples per level, 2M docs, seed 42 — same methodology as
# round 3 (tools/scale_chain.sh). Writes /tmp/scale2m_r4_l<cores>_<s>.json.
# NOTE: do not edit sources or run sbt while this chain runs.
set -u
cd /root/repo
export SPARK_DRIVER_MEM=16g
for s in a b c; do
  for spec in "4 0-3" "16 0-15"; do
    set -- $spec
    cores=$1; cpus=$2
    echo "=== level $cores sample $s ($(date)) ==="
    taskset -c $cpus sbt -batch \
      "runMain graft.tools.ScalingBench level $cores 2000000 /tmp/scale2m_r4_l${cores}_${s}.json" \
      > /tmp/scale2m_r4_l${cores}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
echo "=== r4 chain done ($(date)) ==="
