#!/usr/bin/env bash
# Install crontab entries — equivalent of the reference's setup_cron.sh
# (weekday 12:35/21:35 UTC + weekend + stock 13:00 UTC).
set -euo pipefail
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CRON_TMP="$(mktemp)"
crontab -l 2>/dev/null | grep -v vibevoice_tpu_pipeline > "$CRON_TMP" || true
cat >> "$CRON_TMP" <<CRON
# vibevoice_tpu_pipeline
35 12 * * 1-5 $REPO_DIR/pipelines/run_podcast_pipeline.sh >> $REPO_DIR/logs/cron.log 2>&1
35 21 * * 1-5 $REPO_DIR/pipelines/run_podcast_pipeline.sh >> $REPO_DIR/logs/cron.log 2>&1
35 13 * * 0,6 $REPO_DIR/pipelines/run_podcast_pipeline.sh >> $REPO_DIR/logs/cron.log 2>&1
0 13 * * 1-5 $REPO_DIR/pipelines/run_stock_digest_pipeline.sh >> $REPO_DIR/logs/cron.log 2>&1
CRON
crontab "$CRON_TMP"
rm -f "$CRON_TMP"
echo "cron installed:"
crontab -l | grep -A5 vibevoice_tpu_pipeline
