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
set -e
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
run_leg BENCH/snippets_32_20m_r06.json --master local[32] \
  scripts/bigscale_bench.py --cpus 32 --mult 4000 --snippets

echo "ALL ROUND-6 BENCHES DONE" >&2
