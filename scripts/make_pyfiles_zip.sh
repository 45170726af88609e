#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip dataflow_flex_templates_spark \
    -x '*__pycache__*' -x '*.pyc'
echo "dist/engine.zip"
