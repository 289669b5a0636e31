#!/bin/bash
# Dynamic TPU work queue: drains case lines from results/r4/drain_cases.txt
# (append lines while it runs; it polls for new work every 60 s and exits
# when it processes a line reading "END").  One TPU user at a time: waits
# for tpu_queue3.sh first.  Line formats:
#   case  PROBE OUT SPEC CAP        -> python scripts/PROBE OUT SPEC
#   bd    ALGO ABLATE DIM EV CAP    -> probe_r4_breakdown.py
#   entov MODE S CAP                -> probe_entry_overhead.py
#   argv  PROBE OUT A B C... CAP    -> python scripts/PROBE OUT A B C...
#   END
# Every line is run at most once (tracked in drain_done.txt by line text);
# failures are logged and not retried (append the line again to retry).
#
# Feeds: whatever each queued probe feeds (see the probes' headers).
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4
mkdir -p "$R"
LOG=$R/queue_log.txt
CASES=$R/drain_cases.txt
DONE=/tmp/drain_done.txt
touch "$CASES" "$DONE"

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

log "=== drain start (pid $$) ==="

if [ -f /tmp/queue3.pid ] && kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; then
    log "drain: waiting for queue3 pid $(cat /tmp/queue3.pid)"
    while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
    log "drain: queue3 finished"
fi

while true; do
    # bench.py owns the TPU at end of round: it touches this stop file
    # before waiting on /tmp/drain.pid (see bench._clear_tpu_competitors)
    if [ -f /tmp/drain_stop ]; then
        log "=== drain stop requested (/tmp/drain_stop) ==="
        exit 0
    fi
    ran_any=0
    while IFS= read -r line; do
        [ -z "$line" ] && continue
        case "$line" in \#*) continue ;; esac
        grep -qxF "$line" "$DONE" && continue
        echo "$line" >> "$DONE"
        ran_any=1
        if [ "$line" = "END" ]; then
            log "=== drain complete (END) ==="
            exit 0
        fi
        set -- $line
        typ=$1; shift
        await_tunnel
        case "$typ" in
            case)
                probe=$1 out=$2 spec=$3 cap=$4
                log "DRAIN case $probe $spec (cap ${cap}s)"
                timeout "$cap" python "scripts/$probe" "$out" "$spec" \
                    >> "$LOG" 2>&1 || log "drain case $probe $spec rc=$?"
                ;;
            bd)
                algo=$1 abl=$2 dim=$3 ev=$4 cap=$5
                log "DRAIN bd $algo $abl $dim ev$ev (cap ${cap}s)"
                timeout "$cap" python scripts/probe_r4_breakdown.py \
                    "$R/breakdown.jsonl" "$algo" "$abl" "$dim" "$ev" \
                    >> "$LOG" 2>&1 || log "drain bd $algo/$abl rc=$?"
                ;;
            entov)
                mode=$1 S=$2 cap=$3
                log "DRAIN entov $mode S=$S (cap ${cap}s)"
                timeout "$cap" python scripts/probe_entry_overhead.py \
                    "$R/entry_overhead.jsonl" "$mode" "$S" \
                    >> "$LOG" 2>&1 || log "drain entov $mode rc=$?"
                ;;
            argv)
                probe=$1; shift
                # last field is the cap; the rest are passthrough args
                args=("$@")
                cap=${args[-1]}
                unset 'args[-1]'
                log "DRAIN argv $probe ${args[*]} (cap ${cap}s)"
                timeout "$cap" python "scripts/$probe" "${args[@]}" \
                    >> "$LOG" 2>&1 || log "drain argv $probe rc=$?"
                ;;
            *) log "drain: unknown line type: $line" ;;
        esac
        commit_r "Drain-queue measurement: $typ ${1:-}"
    done < "$CASES"
    [ "$ran_any" = 0 ] && sleep 60
done
