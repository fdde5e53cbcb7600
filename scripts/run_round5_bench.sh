#!/bin/bash
# Round-5 evidence sequence (sequential — concurrent runs would distort
# each other's core counts):
#   1. batched-build N-vs-4N pair at 20M docs (local[2] vs local[8],
#      --build-only) — the r04 item-1 scaling gate re-measurement;
#   2. full 32-core suite (generic vs block-max vs coalesced vs
#      pushdown + batch QPS) — now covering phrase block-max;
#   3. the serving-flow snippets treatment (one-shot index + doc store,
#      whole-log snippets QPS);
#   4. ANN recall at 1M vectors (IVF nprobe sweep + LSH), BENCH/ann_1m.
set -e
cd "$(dirname "$0")/.."
rm -f /tmp/wiser_spark.zip
zip -qr /tmp/wiser_spark.zip wiser_spark __spark_entry__.py
mkdir -p BENCH

run_leg() {  # run_leg <out.json> <args...> — skip when already recorded
  out="$1"; shift
  if [ -s "$out" ]; then echo "skip $out (exists)" >&2; return 0; fi
  spark-submit --driver-memory 48g --py-files /tmp/wiser_spark.zip \
    "$@" --out "$out" 2>&1 | grep -v -E "^2[0-9/: ]+ (INFO|WARN)" | tail -4
}

echo "=== batched build-only local[2] 20M ===" >&2
run_leg BENCH/bigscale_2_20m_r05.json --master local[2] \
  scripts/bigscale_bench.py --cpus 2 --mult 4000 --batches 12 --build-only

echo "=== batched build-only local[8] 20M ===" >&2
run_leg BENCH/bigscale_8_20m_r05.json --master local[8] \
  scripts/bigscale_bench.py --cpus 8 --mult 4000 --batches 12 --build-only

echo "=== full suite local[32] 20M ===" >&2
run_leg BENCH/bigscale_32_20m_r05.json --master local[32] \
  scripts/bigscale_bench.py --cpus 32 --mult 4000 --batches 12

echo "=== snippets serving flow local[32] 20M ===" >&2
run_leg BENCH/snippets_32_20m_r05.json --master local[32] \
  scripts/bigscale_bench.py --cpus 32 --mult 4000 --snippets

echo "=== ANN recall 1M vectors local[32] ===" >&2
run_leg BENCH/ann_1m.json --master local[32] scripts/ann_bigscale.py \
  --n 1000000 --nlist 1024 --clusters 200 --queries 16 --cpus 32 \
  --nprobes 1,4,8,16 --lsh-planes 10 --lsh-tables 8

echo "ALL ROUND-5 BENCHES DONE" >&2
