#!/bin/bash
# Round-4b TPU queue, part 2: compacted far heap ("fheap") A/B.
#
# Measured on CPU: at n=1M galaxy only ~7% (3-D) / ~20% (2-D) of the
# dense far heap's cells are nonempty -- the dense masked eval burns
# T x TB x W pair slots on mass-0 lanes (octree 3-D far field: 0.395 s
# of the 1.86 s probe step).  The fheap knob compacts the eval to the
# nonempty cells (37k argsort + one contiguous row gather + lax.cond
# dense fallback on cap overflow).  Runs AFTER tpu_queue3.sh.
#
# Feeds: BASELINE.md far-field design + knob-flip record.
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

log "=== queue4 start (pid $$) ==="

# ---- stage 0: wait for queue3 ---------------------------------------
if [ -f /tmp/queue3.pid ] && kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; then
    log "queue4 stage 0: waiting for queue3 pid $(cat /tmp/queue3.pid)"
    while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
    log "queue4 stage 0: queue3 finished"
fi

# ---- compacted far heap A/B at n=1M shipped configs -----------------
OCT=$R/knob_oct.jsonl
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,fheap,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,fheap,2,$ev"  1800
done
# combined: fheap + packedj (the two independent levers together)
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,fheap.packedj,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,fheap.packedj,2,$ev"  1800
done
python scripts/summarize_knobs.py "$OCT" $R/knob_bvh.jsonl \
    $R/KNOB_SUMMARY.md >> "$LOG" 2>&1
commit_r "Knob A/B: compacted far heap cases + summary (auto-harvest)"

log "=== queue4 complete ==="
