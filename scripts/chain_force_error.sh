#!/bin/bash
# Chained CPU accuracy work (round 4): wait for the in-flight trajectory
# study, then run the single-evaluation force-error study at scale.
# Feeds: BASELINE.md accuracy-at-scale table (VERDICT r4 item 2).
# Serialized because this host has ONE CPU core.
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 --force-error \
    --out $R/force_err_fresh.json > /tmp/force_fresh.log 2>&1
git add $R/force_err_fresh.json && \
    git commit -q -m "Force-error accuracy at n=131072, fresh (auto-harvest)"

ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 --force-error \
    --evolved --out $R/force_err_evolved.json > /tmp/force_evolved.log 2>&1
# preroll_*.npz caches stay untracked (6-13 MB, regenerable)
git add $R/force_err_evolved.json && \
    git commit -q -m "Force-error accuracy at n=131072, evolved (auto-harvest)"
