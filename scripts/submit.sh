#!/usr/bin/env bash
# Package the library and run the index build via spark-submit --py-files —
# the BASELINE.json deployment contract. On a real cluster, change
# --master (e.g. yarn / k8s://...) and point --corpus/--out at shared
# storage; nothing else changes.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[8]}"
DOCS="${DOCS:-10000}"
ZIP=/tmp/solr_spark_pyfiles.zip

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" solr_spark -x 'solr_spark/__pycache__/*' -x '*/__pycache__/*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-8}" \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_index.py" \
  --corpus "${CORPUS:-/tmp/solr_spark_submit_corpus}" \
  --out "${OUT:-/tmp/solr_spark_submit_idx}" \
  --gen-docs "$DOCS" \
  --query "${QUERY:-public static license}"
