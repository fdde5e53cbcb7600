#!/bin/bash
# Two-cluster-size scaling evidence (north_rule: N vs 4N executors,
# efficiency >= 0.8), evidenced as local[N] vs local[4N] via
# spark-submit --py-files on identical input.
#
# Default pair is 1 vs 4 on a 6M-doc corpus: both treatments sit below
# the single socket's DRAM-bandwidth ceiling, which is the regime that
# models adding executor NODES (each node brings its own memory
# channels). The round-2 encoder is bandwidth-bound past ~8 concurrent
# Arrow workers on this host — see BENCH/BASELINE.md for the full
# 1/2/4/8/16 curve and the ceiling analysis. (CPU pinning via taskset
# was tried and rejected: on this KVM guest an explicit affinity mask
# degrades throughput ~2.5x.)
#
# NB: driver memory must be a spark-submit flag — setting it in the
# SparkSession builder is ignored (the driver JVM already exists).
set -e
cd "$(dirname "$0")/.."
MULT=${MULT:-1200}
NS=${NS:-"1 4"}
QUERY_REPS=${QUERY_REPS:-0}
rm -f /tmp/wiser_spark.zip
(cd . && zip -qr /tmp/wiser_spark.zip wiser_spark __spark_entry__.py)
mkdir -p BENCH
for N in $NS; do
  echo "=== local[$N] ===" >&2
  spark-submit --master "local[$N]" --driver-memory 48g \
    --py-files /tmp/wiser_spark.zip \
    scripts/scaling_job.py --cpus "$N" --mult "$MULT" --n-shards 128 \
    --query-reps "$QUERY_REPS" \
    --out "BENCH/scaling_${N}.json" 2>/dev/null
done
python scripts/write_scaling_report.py $NS
