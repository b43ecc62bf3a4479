#!/usr/bin/env bash
# Segmented training for the tunneled dev backend (docs/PERF.md
# "Dev-tunnel H2D retention"): the axon dev client retains every byte it
# transfers H2D, so long runs either OOM or livelock around ~90 GB RSS.
# This wrapper runs intentbev-train in bounded-step segments, resuming
# from the latest checkpoint in a fresh process each time. On production
# hosts (no retention) it is unnecessary — run the CLI directly.
#
# Mid-epoch segment boundaries are exact: train.py checkpoints the
# intra-epoch iterator position (loop.epoch_batch) and resume fast-forwards
# the seeded iterator to it — no epoch index is burned, no data is skipped
# or replayed, and the plateau scheduler only steps on COMPLETED epochs
# (never on a segment's partial-epoch mean).
#
# Usage:
#   tools/train_segments.sh <segment_steps> <total_steps> <out_dir> [train args...]
# Example:
#   tools/train_segments.sh 2000 9000 runs/vit \
#       --data_dir /data/av2/train --model vit --num_workers 4
set -euo pipefail

SEG=${1:?segment_steps}; TOTAL=${2:?total_steps}; OUT=${3:?out_dir}; shift 3

step=0
first=1
while [ "$step" -lt "$TOTAL" ]; do
    target=$((step + SEG)); [ "$target" -gt "$TOTAL" ] && target=$TOTAL
    if [ "$first" -eq 1 ] && [ ! -d "$OUT" ]; then
        python -m intentbev.train --out_dir "$OUT" --max_steps "$target" "$@"
    else
        python -m intentbev.train --out_dir "$OUT" --max_steps "$target" --resume "$@"
    fi
    first=0
    # latest checkpoint dir name encodes the step: step_XXXXXXXX
    last=$(ls -1d "$OUT"/step_* 2>/dev/null | sort | tail -1 || true)
    [ -z "$last" ] && { echo "no checkpoint written; aborting" >&2; exit 1; }
    new_step=$(basename "$last" | sed 's/step_0*//')
    if [ "$new_step" -le "$step" ]; then
        echo "no forward progress (still at step $new_step); aborting" >&2
        exit 1
    fi
    step=$new_step
    echo "--- segment done at step $step / $TOTAL ---"
done
