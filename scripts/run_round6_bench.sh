#!/bin/bash
# Round-6 evidence sequence (sequential — concurrent runs would distort
# each other's core counts):
#   1. full 32-core 20M suite (generic vs block-max vs coalesced vs
#      pushdown + batch QPS) on the r06 code (shard-clustered segment
#      cache, per-shard compaction merge);
#   2. the serving-flow snippets treatment (one-shot index + doc store
#      with 4 MB point-read row groups, whole-log snippets QPS).
# Every result json self-records loadavg/steal%/corpus hash (_env_info),
# and this script refuses to run when the fixture hash drifted from the
# BENCH/FIXTURE.md pin (r06 hygiene — VERDICT item 8).
set -e -o pipefail  # pipefail: run_leg pipes through grep/tail — without
                    # it a crashed spark-submit exits 0 and the missing
                    # json goes unnoticed (how the first r06 snippets-leg
                    # OOM went silent)
cd "$(dirname "$0")/.."

SF01_PIN="d10b0da67e5aceb465e89365781dab5c69d3c62b64a8308398c6fd3fb09bcf82"
live=$(python - <<'EOF'
import hashlib, os
root = "/root/testdata/sf0.1/documents.parquet"
h = hashlib.sha256()
ts = sorted(os.path.join(root, p) for p in os.listdir(root)
            if not p.startswith(("_", "."))) if os.path.isdir(root) else [root]
for p in ts:
    h.update(open(p, "rb").read())
print(h.hexdigest())
EOF
)
if [ "$live" != "$SF01_PIN" ]; then
  echo "FIXTURE MISMATCH: sf0.1 corpus hash $live != pinned $SF01_PIN" >&2
  echo "(data regenerated — update BENCH/FIXTURE.md, then re-pin)" >&2
  exit 2
fi

rm -f /tmp/wiser_spark.zip
zip -qr /tmp/wiser_spark.zip wiser_spark __spark_entry__.py
mkdir -p BENCH

run_leg() {  # run_leg <out.json> <args...> — skip when already recorded
  out="$1"; shift
  if [ -s "$out" ]; then echo "skip $out (exists)" >&2; return 0; fi
  spark-submit --driver-memory 48g --py-files /tmp/wiser_spark.zip \
    "$@" --out "$out" 2>&1 | grep -v -E "^2[0-9/: ]+ (INFO|WARN)" | tail -4
}

echo "=== full suite local[32] 20M ===" >&2
run_leg BENCH/bigscale_32_20m_r06.json --master local[32] \
  scripts/bigscale_bench.py --cpus 32 --mult 4000 --batches 12

echo "=== snippets serving flow local[32] 20M ===" >&2
# 256 shards + 32g driver FOR THIS LEG ONLY: the one-shot build holds a
# whole partition's encode arrays per worker — at 128 shards that is
# 156k docs/task ≈ 3.5 GB RSS x 32 workers, which with a 48 g JVM
# OOM-killed the host (dmesg-confirmed; also the likely cause of r05's
# 1000 s thrashing run of this leg). 256 shards halve per-task arrays;
# query cost is unaffected — the shard-clustered cache scans by
# partition count, not shard count.
run_leg BENCH/snippets_32_20m_r06.json --master local[32] --driver-memory 32g \
  scripts/bigscale_bench.py --cpus 32 --mult 4000 --snippets --n-shards 256

echo "ALL ROUND-6 BENCHES DONE" >&2
