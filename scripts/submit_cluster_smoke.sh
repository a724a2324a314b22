#!/usr/bin/env bash
# North-rule clause "runs via spark-submit --py-files on a multi-executor
# cluster", demonstrated literally: the rollup job submitted to a
# local-cluster master (N separate executor JVMs + standalone-style netty
# shuffle — the same wire path a real cluster uses, minus the network).
#
# Usage: scripts/submit_cluster_smoke.sh [n_executors] [cores_per_exec]
# Verified round 5: 2x4 finishes the 500-url/30-day synthetic in ~30 s
# with all three tiers + segment blobs + lineage metrics written.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"; C="${2:-4}"
ZIP=$(mktemp -u /tmp/engine.XXXX.zip)
zip -qr "$ZIP" yatsm_spark
OUT=$(mktemp -d /tmp/rollup_lc.XXXX)
"${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "local-cluster[$N,$C,4096]" \
  --conf spark.executor.memory=3g \
  --conf spark.driver.memory=4g \
  --py-files "$ZIP" \
  jobs/rollup.py --input SYNTH --synthetic 500:30 \
  --output "$OUT" --run-id "lc_smoke" 2>&1 | tail -3
echo "lineage:"
cat "$OUT"/_meta/*.jsonl
rm -rf "$OUT" "$ZIP"
