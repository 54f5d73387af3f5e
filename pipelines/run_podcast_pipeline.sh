#!/usr/bin/env bash
# Podcast automation pipeline — equivalent of the reference's
# run_podcast_pipeline.sh: fetch script -> batch inference w/ captions ->
# wav->mp3 (ffmpeg when present) -> optional upload hook.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
DATE_TAG="${DATE_TAG:-$(date +%Y-%m-%d)}"
SCRIPTS_DIR="${SCRIPTS_DIR:-$REPO_DIR/data/scripts/$DATE_TAG}"
OUTPUT_DIR="${OUTPUT_DIR:-$REPO_DIR/outputs/$DATE_TAG}"
MODEL_PATH="${MODEL_PATH:-}"
LOG_DIR="${LOG_DIR:-$REPO_DIR/logs}"
mkdir -p "$LOG_DIR" "$OUTPUT_DIR"
LOG="$LOG_DIR/podcast_$DATE_TAG.log"

echo "[$(date)] podcast pipeline start (scripts=$SCRIPTS_DIR)" | tee -a "$LOG"

if [ ! -d "$SCRIPTS_DIR" ] || [ -z "$(ls -A "$SCRIPTS_DIR" 2>/dev/null)" ]; then
  echo "[$(date)] no scripts found in $SCRIPTS_DIR, exiting" | tee -a "$LOG"
  exit 0
fi

MODEL_ARG=""
[ -n "$MODEL_PATH" ] && MODEL_ARG="--model_path $MODEL_PATH"

python "$REPO_DIR/demo/batch_inference_simple_captions.py" \
  $MODEL_ARG \
  --input_dir "$SCRIPTS_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --batch_size "${BATCH_SIZE:-8}" 2>&1 | tee -a "$LOG"

# wav -> mp3 192k when ffmpeg is available
if command -v ffmpeg >/dev/null 2>&1; then
  for wav in "$OUTPUT_DIR"/*.wav; do
    [ -e "$wav" ] || continue
    ffmpeg -y -i "$wav" -b:a 192k "${wav%.wav}.mp3" >>"$LOG" 2>&1
  done
fi

# optional upload hook (e.g. a node script), mirroring the reference's uploads
if [ -n "${UPLOAD_CMD:-}" ]; then
  $UPLOAD_CMD "$OUTPUT_DIR" 2>&1 | tee -a "$LOG"
fi

echo "[$(date)] podcast pipeline done" | tee -a "$LOG"
