#!/usr/bin/env bash
# Manually exercise the pipeline with today's date (equivalent of the
# reference's test_cron_command.sh).
set -euo pipefail
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
DATE_TAG="$(date +%Y-%m-%d)" exec "$REPO_DIR/pipelines/run_podcast_pipeline.sh"
