#!/bin/bash
# Round-5b MULTI-EXECUTOR chain with a CONSTANT driver budget: the earlier
# lc chain gave each level "2N executor cpus + 1 shared driver cpu", so the
# cpu budget grew 3x while task slots grew 4x and the raw ratio UNDER-stated
# scaling by construction. Here the driver is pinned to a fixed 2-cpu
# budget at BOTH levels and only the executor cpus grow, exactly 2 -> 8
# (N -> 4N executors x 2 cores): the throughput ratio over 4 IS the
# executor-scaling efficiency, no per-cpu normalization needed.
# 3 interleaved samples; requires `sbt -batch package` first (no sbt lock
# taken, but run nothing else while it measures).
set -u
cd /root/repo
export SPARK_HOME=/opt/spark
JAR=target/scala-2.13/docsensespark_2.13-0.1.0.jar
for s in a b c; do
  for spec in "1 2 0-3" "4 8 0-9"; do
    set -- $spec
    execs=$1; cores=$2; cpus=$3
    echo "=== executors $execs (exec cores $cores, driver 2 cpus) sample $s ($(date)) ==="
    SPARK_GRAFT_MASTER="local-cluster[$execs,2,8192]" taskset -c $cpus \
      /opt/spark/bin/spark-submit --master "local-cluster[$execs,2,8192]" \
      --driver-memory 8g --conf spark.executor.memory=6g \
      --class graft.tools.ScalingBench "$JAR" \
      level $cores 2000000 /tmp/lc2m_r5b_e${execs}_${s}.json \
      > /tmp/lc2m_r5b_e${execs}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
echo "=== r5b local-cluster chain done ($(date)) ==="
