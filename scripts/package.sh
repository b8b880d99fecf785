#!/usr/bin/env bash
# Build dist/pipeline.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pipeline.zip
zip -qr dist/pipeline.zip java9_gc_log_parser_spark -x '*__pycache__*'
echo "built dist/pipeline.zip"
unzip -l dist/pipeline.zip | tail -2
