#!/bin/bash
# Follow-on TPU queue (round 4): epg entry-packing A/Bs (VERDICT item 4
# lever: the near field is grid-step-count-bound at ~2 us fixed per
# entry; packing epg entries per step divides the step count).  Runs
# AFTER scripts/tpu_queue.sh finishes (one TPU user at a time); same
# idempotent resumable structure.
#
# Feeds: BASELINE.md near-field entry cost model + knob-flip record.
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4
mkdir -p "$R"
LOG=$R/queue_log.txt

log() { echo "[$(date +%F' '%T)] $*" >> "$LOG"; echo "$*"; }

alive() {
    timeout 240 python -c \
      "import jax.numpy as jnp; print(float(jnp.arange(4.).sum()))" \
      2>/dev/null | grep -q '6.0'
}

await_tunnel() {
    local n=0
    while ! alive; do
        n=$((n + 1))
        log "tunnel dead (probe $n); sleeping 300s"
        sleep 300
    done
}

commit_r() {
    for _ in 1 2 3; do
        git add "$R" 2>/dev/null
        if git commit -q -m "$1" 2>/dev/null; then return 0; fi
        git diff --cached --quiet && return 0
        sleep 7
    done
    log "commit failed: $1"
}

run_case() {
    local probe=$1 out=$2 spec=$3 cap=$4
    if grep -qF "\"spec\": \"$spec\", \"n\"" "$out" 2>/dev/null &&
       grep -F "\"spec\": \"$spec\"" "$out" | grep -q '"sec"'; then
        log "skip $probe $spec (done)"; return
    fi
    if [ "$(grep -cF "\"spec\": \"$spec\"" "$out" 2>/dev/null)" -ge 2 ]; then
        log "skip $probe $spec (errored twice)"; return
    fi
    await_tunnel
    log "RUN $probe $spec (cap ${cap}s)"
    timeout "$cap" python "scripts/$probe" "$out" "$spec" >> "$LOG" 2>&1
    local rc=$?
    [ $rc -ne 0 ] && log "case $probe $spec rc=$rc"
}

log "=== queue2 start (pid $$) ==="

# ---- stage 0: wait for queue1 ---------------------------------------
if [ -f /tmp/queue.pid ] && kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; then
    log "queue2 stage 0: waiting for queue1 pid $(cat /tmp/queue.pid)"
    while kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; do sleep 60; done
    log "queue2 stage 0: queue1 finished"
fi

# ---- epg packing A/B at shipped configs, 3-D fresh + evolved --------
OCT=$R/knob_oct.jsonl
BVH=$R/knob_bvh.jsonl
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,epg8,3,$ev"  1800
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,epg16,3,$ev" 1800
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,epg8,$ev,3"   1800
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,epg16,$ev,3"  1800
done
python scripts/summarize_knobs.py "$OCT" "$BVH" $R/KNOB_SUMMARY.md \
    >> "$LOG" 2>&1
commit_r "Knob A/B: epg packing cases + summary (auto-harvest)"

log "=== queue2 complete ==="
