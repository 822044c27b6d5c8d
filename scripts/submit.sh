#!/usr/bin/env bash
# spark-submit packaging (north rule: runs via spark-submit --py-files on a
# multi-executor cluster). Zips the package and submits the CLI.
#
#   ./scripts/submit.sh [--master spark://...] -- --in triples.nt --out out/
#
# Defaults to local[*] so the same script works in this sandbox.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[*]"
if [[ "${1:-}" == "--master" ]]; then
  MASTER="$2"; shift 2
fi
[[ "${1:-}" == "--" ]] && shift

ZIP="$(mktemp -d)/rdf2smw_spark.zip"
(cd "$REPO_DIR" && zip -qr "$ZIP" rdf2smw_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO_DIR/rdf2smw_spark/__main__.py" "$@"
