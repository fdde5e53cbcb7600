#!/bin/bash
# Two-cluster-size scaling evidence (north_rule: N vs 4N executors,
# efficiency >= 0.8), evidenced as local[4] vs local[16] via
# spark-submit --py-files on identical input (8M docs by default).
#
# Why 4 vs 16 on a 32-core host: each Spark task drives a JVM thread
# AND an Arrow python worker, so a local[N] treatment really consumes
# up to ~2N cores; 4-vs-16 keeps BOTH treatments unconstrained by the
# host (16*2 = 32), making the comparison a true parallelism ratio.
# (CPU pinning via taskset was tried and rejected: on this KVM guest an
# explicit affinity mask degrades throughput ~2.5x, see BENCH notes.)
#
# NB: driver memory must be a spark-submit flag — setting it in the
# SparkSession builder is ignored (the driver JVM already exists).
set -e
cd "$(dirname "$0")/.."
MULT=${MULT:-1600}
NS=${NS:-"2 8"}
rm -f /tmp/wiser_spark.zip
(cd . && zip -qr /tmp/wiser_spark.zip wiser_spark __spark_entry__.py)
mkdir -p BENCH
for N in $NS; do
  echo "=== local[$N] ===" >&2
  spark-submit --master "local[$N]" --driver-memory 48g \
    --py-files /tmp/wiser_spark.zip \
    scripts/scaling_job.py --cpus "$N" --mult "$MULT" --n-shards 128 \
    --out "BENCH/scaling_${N}.json" 2>/dev/null
done
python scripts/write_scaling_report.py $NS
