#!/bin/bash
# Round-5 MULTI-EXECUTOR topology chain: the identical 2M-doc build+query
# job spark-submitted under local-cluster[N,2,mem] — N separate executor
# JVMs (own heap/GC, netty shuffle, RPC broadcast), the closest single-box
# stand-in for the north rule's "N vs 4N executors". Levels: 1 executor × 2
# cores vs 4 executors × 2 cores (N -> 4N executors), 3 interleaved samples,
# pinned so each level sees a fixed cpu budget (driver gets 1 extra cpu at
# both levels). Requires `sbt -batch package` first (uses the packaged jar;
# does NOT take the sbt lock, but do not run other load while it measures).
set -u
cd /root/repo
export SPARK_HOME=/opt/spark
JAR=target/scala-2.13/docsensespark_2.13-0.1.0.jar
for s in a b c; do
  for spec in "1 2 0-2" "4 8 0-8"; do
    set -- $spec
    execs=$1; cores=$2; cpus=$3
    echo "=== executors $execs (cores $cores) sample $s ($(date)) ==="
    SPARK_GRAFT_MASTER="local-cluster[$execs,2,8192]" taskset -c $cpus \
      /opt/spark/bin/spark-submit --master "local-cluster[$execs,2,8192]" \
      --driver-memory 8g --conf spark.executor.memory=6g \
      --class graft.tools.ScalingBench "$JAR" \
      level $cores 2000000 /tmp/lc2m_r5_e${execs}_${s}.json \
      > /tmp/lc2m_r5_e${execs}_${s}.log 2>&1
    rm -rf /tmp/graft_scale_${cores}_*
  done
done
echo "=== r5 local-cluster chain done ($(date)) ==="
