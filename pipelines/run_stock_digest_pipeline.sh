#!/usr/bin/env bash
# Stock-digest variant — per-ticker batch generation (equivalent of the
# reference's run_stock_digest_pipeline.sh).
set -euo pipefail
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
DATE_TAG="${DATE_TAG:-$(date +%Y-%m-%d)}"
SCRIPTS_DIR="${SCRIPTS_DIR:-$REPO_DIR/data/stock_scripts/$DATE_TAG}"
OUTPUT_DIR="${OUTPUT_DIR:-$REPO_DIR/outputs/stock/$DATE_TAG}"
export SCRIPTS_DIR OUTPUT_DIR
exec "$REPO_DIR/pipelines/run_podcast_pipeline.sh"
