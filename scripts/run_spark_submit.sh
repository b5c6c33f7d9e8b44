#!/usr/bin/env bash
# Package the engine and run one query via spark-submit --py-files.
# Usage: scripts/run_spark_submit.sh [query] [sf_dir] [out_dir] [master]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
QUERY="${1:-pip_join}"
SF_DIR="${2:-/root/testdata/sf0.001}"
OUT="${3:-/tmp/ssb_sgis_spark_submit_out}"
MASTER="${4:-local[8]}"

ZIP=/tmp/ssb_sgis_spark_pkg.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" ssb_sgis_spark __spark_entry__.py)

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_job.py" \
  --sf-dir "$SF_DIR" --query "$QUERY" --out "$OUT"
