#!/bin/bash
# Resumable serialized TPU measurement queue (round 4).
#
# Feeds: BENCH_r04 + BASELINE.md authoritative/knob/breakdown/f64/matrix
# tables (VERDICT r4 items 1-5).  Committed (not /tmp) because the host
# restarted mid-round and took the previous queue with it.
#
# Design rules (CLAUDE.md): ONE TPU process at a time (a second process
# competing through the axon tunnel crashes the worker); every case in
# its own subprocess with a hard timeout; a liveness gate with 5-min
# backoff between cases so a tunnel flap is waited out, not burned; each
# stage's artifact committed the moment it lands so a host restart or a
# dead session never loses measurements.
#
# Every case is keyed by its output line in results/r4/*.jsonl -- re-runs
# skip completed cases, so the script is idempotent and resumable.
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
    # serialize with any interactive commits: retry on index-lock races
    for _ in 1 2 3; do
        git add "$R" 2>/dev/null
        if git commit -q -m "$1" 2>/dev/null; then return 0; fi
        git diff --cached --quiet && return 0   # nothing staged
        sleep 7
    done
    log "commit failed: $1"
}

# run_case PROBE OUT SPEC CAP -- skip if SPEC already has a timed line
# (or already errored twice -- deterministic failures are not retried
# forever, but each errored case gets one second chance).
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

log "=== queue start (pid $$) ==="

# ---- stage 0: wait for any in-flight bench.py run (one TPU user) ----
if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
    log "stage 0: waiting for bench.py pid $(cat /tmp/bench.pid)"
    while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
    log "stage 0: bench.py finished"
fi
if [ -s /tmp/bench_r4_run1.out ] && [ ! -s $R/bench_run1.json ]; then
    tail -1 /tmp/bench_r4_run1.out > $R/bench_run1.json
    commit_r "Harvest bench.py run 1 (first TPU contact of round 4)"
fi

# ---- stage 1: knob A/B (VERDICT item 3) -----------------------------
# octree SPEC = tile,s_block,window,ablate,dim,evolved
# shipped defaults: tile=512, s_block=1024 (3-D) / 256 (2-D), window=32
# candidate (the cocked knob): tile=1024 + 1024-body nodes
OCT=$R/knob_oct.jsonl
for ev in 0 1; do
    run_case probe_oct_knobs.py "$OCT" "512,1024,32,none,3,$ev"  1800
    run_case probe_oct_knobs.py "$OCT" "1024,1024,32,none,3,$ev" 1800
    run_case probe_oct_knobs.py "$OCT" "512,256,32,none,2,$ev"   1800
    run_case probe_oct_knobs.py "$OCT" "1024,1024,32,none,2,$ev" 1800
done
python scripts/summarize_knobs.py "$OCT" $R/knob_bvh.jsonl \
    $R/KNOB_SUMMARY.md >> "$LOG" 2>&1
commit_r "Knob A/B: octree cases (auto-harvest)"

# bvh SPEC = tile,s_target,window,ablate,evolved[,dim]
# shipped defaults: tile=512, s_target=512, window=32
BVH=$R/knob_bvh.jsonl
for ev in 0 1; do
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,none,$ev,3"   1800
    run_case probe_bvh_knobs.py "$BVH" "1024,1024,32,none,$ev,3" 1800
    run_case probe_bvh_knobs.py "$BVH" "512,512,32,none,$ev,2"   1800
    run_case probe_bvh_knobs.py "$BVH" "1024,1024,32,none,$ev,2" 1800
done
python scripts/summarize_knobs.py "$OCT" "$BVH" $R/KNOB_SUMMARY.md \
    >> "$LOG" 2>&1
commit_r "Knob A/B: bvh cases + summary (auto-harvest)"

# ---- stage 2: per-phase breakdown, 3-D fresh (VERDICT item 4) -------
for abl in none near nlist far win; do
    run_bd octree "$abl" 3 0 1500
done
for abl in none resid rlist far win; do
    run_bd bvh "$abl" 3 0 1500
done
python scripts/summarize_breakdown.py $R/breakdown.jsonl \
    > $R/BREAKDOWN.md 2>>"$LOG"
commit_r "Per-phase breakdowns, 3-D fresh (auto-harvest)"

# ---- stage 3: f64 list-path tree steps (VERDICT item 2) -------------
if ! grep -q '"sec"' $R/f64_tree.jsonl 2>/dev/null; then
    await_tunnel
    log "RUN probe_f64_tree (cap 3600s)"
    timeout 3600 python scripts/probe_f64_tree.py $R/f64_tree.jsonl \
        >> "$LOG" 2>&1 || log "f64 probe rc=$?"
    commit_r "f64 list-path tree step costs (auto-harvest)"
fi

# ---- stage 4: reference benchmark matrix (VERDICT item 5) -----------
if [ ! -s $R/benchmark_float.csv ]; then
    await_tunnel
    log "RUN benchmark matrix float --detailed (cap 7200s)"
    timeout 7200 python scripts/benchmark.py --precision float --detailed \
        --out $R/benchmark_float.csv >> "$LOG" 2>&1 || log "matrix float rc=$?"
    commit_r "Reference benchmark matrix, float (TPU fast paths)"
fi
if [ ! -s $R/benchmark_double.csv ]; then
    await_tunnel
    # double on TPU = emulated-f64 list paths, tens of s/step at 1M:
    # bound to 20 standard / 5 big steps (per-step rate is what transfers)
    log "RUN benchmark matrix double (cap 10800s)"
    timeout 10800 python scripts/benchmark.py --precision double \
        --steps 20 --big-steps 5 --out $R/benchmark_double.csv \
        >> "$LOG" 2>&1 || log "matrix double rc=$?"
    commit_r "Reference benchmark matrix, double (f64 list paths, bounded steps)"
fi

log "=== queue complete ==="
