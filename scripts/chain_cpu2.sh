#!/bin/bash
# CPU chain 2 (round 4): takes over from chain_force_error.sh after its
# FRESH stage, reordering the remaining work so the highest-value
# correction runs first:
#   1. re-measure the FRESH trajectory studies at HEAD — the committed
#      acc_cpu_{2,3}d_fresh.json rows were measured with the old
#      true-3-D-curve BVH default, so their elementwise bvh columns
#      (0.85 / 0.64) are pure body-reorder artifacts (no canon columns
#      = pre-cross-check script)
#   2. force-error evolved (preroll cached to results/preroll_*.npz)
#   3. full pytest suite
# Feeds: BASELINE.md accuracy tables (VERDICT r4 item 2).
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4

# ---- stage 0: wait for chain_fe's fresh stage, then take over -------
while [ ! -s $R/force_err_fresh.json ]; do
    # if chain_fe died without producing it, run it ourselves
    if ! kill -0 "$(cat /tmp/chain_fe.pid 2>/dev/null)" 2>/dev/null; then
        ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 \
            --force-error --out $R/force_err_fresh.json \
            > /tmp/force_fresh.log 2>&1
        git add $R/force_err_fresh.json && git commit -q \
            -m "Force-error accuracy at n=131072, fresh (auto-harvest)"
        break
    fi
    sleep 60
done
sleep 90   # let chain_fe finish its commit and enter the evolved preroll
if kill -0 "$(cat /tmp/chain_fe.pid 2>/dev/null)" 2>/dev/null; then
    root=$(cat /tmp/chain_fe.pid)
    for p in $(pgrep -P "$root"); do kill "$p" 2>/dev/null; done
    kill "$root" 2>/dev/null
    sleep 5
    for p in $(pgrep -P "$root" 2>/dev/null); do kill -9 "$p" 2>/dev/null; done
fi

# ---- stage 1: fresh trajectory re-measure at HEAD --------------------
if ! grep -q canon $R/acc_cpu_2d_fresh.json 2>/dev/null; then
    ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 10 --dims 2 \
        --no-ap-oracle --out $R/acc_cpu_2d_fresh.json \
        > /tmp/acc2d_fresh.log 2>&1
    git add $R/acc_cpu_2d_fresh.json && git commit -q \
        -m "Re-measure fresh 2-D trajectory accuracy at HEAD (quirk-curve bvh order)"
fi
if ! grep -q canon $R/acc_cpu_3d_fresh.json 2>/dev/null; then
    ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 10 --dims 3 \
        --no-ap-oracle --out $R/acc_cpu_3d_fresh.json \
        > /tmp/acc3d_fresh.log 2>&1
    git add $R/acc_cpu_3d_fresh.json && git commit -q \
        -m "Re-measure fresh 3-D trajectory accuracy at HEAD (quirk-curve bvh order)"
fi

# ---- stage 2: force-error evolved ------------------------------------
if [ ! -s $R/force_err_evolved.json ]; then
    ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 \
        --force-error --evolved --out $R/force_err_evolved.json \
        > /tmp/force_evolved.log 2>&1
    git add $R/force_err_evolved.json && git commit -q \
        -m "Force-error accuracy at n=131072, evolved (auto-harvest)"
fi

# ---- stage 3: full suite ---------------------------------------------
timeout 3600 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
tail -3 /tmp/pytest_full.log
