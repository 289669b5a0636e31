#!/bin/bash
# Round-4b TPU queue: entry-kernel overhead decomposition + packed-j A/B.
#
# The dma_pipeline microbench (results/r4/dma_pipeline.jsonl) left a
# ~1.9 us/entry production-vs-ideal gap in the near-field eval
# (BASELINE.md "Refined near-field cost model", round-5 attack item 1).
# probe_entry_overhead.py decomposes it rung by rung; the packedj knob
# (one (4,S) coords+mass DMA per entry instead of xjt+mj two) is the
# first candidate recovery, A/B'd at production n=1M through the knob
# probes.  Same idempotent resumable structure as tpu_queue{1,2}.sh.
#
# Feeds: BASELINE.md refined near-field cost model + knob-flip record.
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4
mkdir -p "$R"
LOG=$R/queue_log.txt

log() { echo "[$(date +%F' '%T)] $*" >> "$LOG"; echo "$*"; }

alive() {
    timeout 420 python -c \
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

# probe_entry_overhead has mode+S keys instead of spec
run_entov() {
    local out=$1 mode=$2 S=$3 cap=$4
    if grep -F "\"mode\": \"$mode\"" "$out" 2>/dev/null |
       grep -F "\"S\": $S" | grep -q '"sec_per_call"'; then
        log "skip entov $mode S=$S (done)"; return
    fi
    await_tunnel
    log "RUN entov $mode S=$S (cap ${cap}s)"
    timeout "$cap" python scripts/probe_entry_overhead.py "$out" \
        "$mode" "$S" >> "$LOG" 2>&1
    local rc=$?
    [ $rc -ne 0 ] && log "entov $mode S=$S rc=$rc"
}

log "=== queue3 start (pid $$) ==="

# ---- stage 0: wait for + harvest the in-flight bench.py run ---------
if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
    log "stage 0: waiting for bench.py pid $(cat /tmp/bench.pid)"
    while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
    log "stage 0: bench.py finished"
fi
if [ -s /tmp/bench_r4_run4.out ] && [ ! -s $R/bench_run4.json ]; then
    tail -1 /tmp/bench_r4_run4.out > $R/bench_run4.json
    commit_r "Harvest bench run 4: post-epg-flip production paths"
fi

# ---- stage 1: entry-overhead ladder (octree- and bvh-like configs) --
EO=$R/entry_overhead.jsonl
for m in ideal sepmj sel when switch prod prod_noskip prod_packed \
         prod_packed_noskip; do
    run_entov "$EO" "$m" 1024 1200
done
for m in ideal sepmj sel when switch prod prod_noskip prod_packed \
         prod_packed_noskip; do
    run_entov "$EO" "$m" 512 1200
done
commit_r "Entry-overhead structure ladder (auto-harvest)"

# ---- stage 2: packed-j production A/B at n=1M shipped configs -------
OCT=$R/knob_oct.jsonl
BVH=$R/knob_bvh.jsonl
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,packedj,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,packedj,2,$ev"  1800
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,packedj,$ev,3"  1800
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,packedj,$ev,2"  1800
done
python scripts/summarize_knobs.py "$OCT" "$BVH" $R/KNOB_SUMMARY.md \
    >> "$LOG" 2>&1
commit_r "Knob A/B: packed-j near-field DMA cases + summary (auto-harvest)"

# ---- stage 3: compacted far heap A/B at n=1M shipped configs --------
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,fheap,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,fheap,2,$ev"  1800
done
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,fheap.packedj,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,fheap.packedj,2,$ev"  1800
done
python scripts/summarize_knobs.py "$OCT" "$BVH" $R/KNOB_SUMMARY.md \
    >> "$LOG" 2>&1
commit_r "Knob A/B: compacted far heap cases + summary (auto-harvest)"

# ---- stage 4: remainder split (sort vs masks/build) -----------------
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

log "=== queue3 complete ==="
