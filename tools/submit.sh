#!/usr/bin/env bash
# Launch the gsearch_spark CLI on a real cluster via spark-submit
# --py-files (the north-rule deployment path).  Everything BEFORE the
# first subcommand keyword (tohnsw | add | request) is passed to
# spark-submit verbatim; everything from the keyword on goes to the CLI.
#
#   tools/submit.sh --master spark://host:7077 \
#       --num-executors 4 --executor-cores 8 --executor-memory 8g \
#       tohnsw -d s3a://bucket/images.parquet -b s3a://bucket/build \
#       --bucketed
#
#   tools/submit.sh --master yarn --deploy-mode cluster \
#       add -b hdfs:///builds/b1 -n hdfs:///incoming/day=2026-08-17
#
# The package is zipped fresh on every launch so executors always run
# the code being submitted; SPARK_GRAFT_MASTER=from-submit tells
# gsearch_spark.session.get_spark to leave master/deploy/executor
# settings to spark-submit instead of forcing local[].
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
ZIP="$STAGE/gsearch_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" gsearch_spark -x '*__pycache__*')

SUBMIT_ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    tohnsw|add|request) break ;;
    *) SUBMIT_ARGS+=("$1"); shift ;;
  esac
done
if [[ $# -eq 0 ]]; then
  echo "usage: $0 [spark-submit args] tohnsw|add|request [cli args]" >&2
  exit 2
fi

SPARK_SUBMIT="${SPARK_SUBMIT:-spark-submit}"
SPARK_GRAFT_MASTER=from-submit exec "$SPARK_SUBMIT" \
  "${SUBMIT_ARGS[@]}" \
  --py-files "$ZIP" \
  "$REPO/tools/cli_driver.py" "$@"
