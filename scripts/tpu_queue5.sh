#!/bin/bash
# Round-4b TPU queue, part 3: remainder decomposition (sort vs masks /
# build) for the non-force ~0.31-0.37 s phase of the tree steps.
#
# BASELINE.md round-5 pointer: octree 2-D evolved spends ~0.31 s OUTSIDE
# force eval; at the 0.6 s target that phase is co-equal with the near
# field.  New probe_r4_breakdown modes: "sortonly" (bounds + quantize +
# Morton/Hilbert sort + permutation + integrate) and bvh "buildonly"
# (sort + tree build) split the remainder.  Runs AFTER tpu_queue4.sh.
#
# Feeds: BASELINE.md per-phase breakdown (remainder split).
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

# run_bd ALGO ABLATE DIM EVOLVED CAP
run_bd() {
    local algo=$1 abl=$2 dim=$3 ev=$4 cap=$5
    local out=$R/breakdown.jsonl
    local key="\"algo\": \"$algo\", \"dim\": $dim, \"evolved\": $ev, \"ablate\": \"$abl\""
    if grep -F "$key" "$out" 2>/dev/null | grep -q '"sec"'; then
        log "skip bd $algo/$abl/$dim/ev$ev (done)"; return
    fi
    if [ "$(grep -cF "$key" "$out" 2>/dev/null)" -ge 2 ]; then
        log "skip bd $algo/$abl/$dim/ev$ev (errored twice)"; return
    fi
    await_tunnel
    log "RUN breakdown $algo $abl dim=$dim ev=$ev (cap ${cap}s)"
    timeout "$cap" python scripts/probe_r4_breakdown.py "$out" "$algo" \
        "$abl" "$dim" "$ev" >> "$LOG" 2>&1 || log "bd $algo/$abl rc=$?"
}

log "=== queue5 start (pid $$) ==="

# ---- stage 0: wait for queue4 ---------------------------------------
if [ -f /tmp/queue4.pid ] && kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; then
    log "queue5 stage 0: waiting for queue4 pid $(cat /tmp/queue4.pid)"
    while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 60; done
    log "queue5 stage 0: queue4 finished"
fi

# ---- remainder split ------------------------------------------------
run_bd octree sortonly 2 1 1500
run_bd octree sortonly 2 0 1500
run_bd octree sortonly 3 0 1500
run_bd octree "near,far,win" 2 1 1500
run_bd octree "near,far,win" 3 0 1500
run_bd bvh sortonly 3 0 1500
run_bd bvh buildonly 3 0 1500
run_bd bvh sortonly 2 1 1500
run_bd bvh buildonly 2 1 1500
commit_r "Remainder decomposition: sort vs masks/build (auto-harvest)"

log "=== queue5 complete ==="
