#!/bin/bash
# CPU chain 3 (round 4, supersedes chain_cpu2/chain_force_error): runs
# after the in-flight 3-D fresh bvh trajectory re-measure (a prior
# watcher, writes acc_cpu_3d_fresh_bvh.json).  Sequence:
#   1. merge the re-measured bvh row into acc_cpu_3d_fresh.json, commit
#   2. force-error FRESH with the softening-matched oracle (the earlier
#      run scored octree legs against the all-pairs convention and
#      mis-reported the reference's close-pair softening quirk as a
#      5.5e-3 'error')
#   3. force-error EVOLVED (preroll cached)
#   4. full pytest suite
# Feeds: BASELINE.md accuracy tables (VERDICT r4 item 2).
set -u
cd "$(dirname "$0")/.." || exit 1
R=results/r4

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

# ---- stage 1: merge the re-measured bvh trajectory row ---------------
if [ -s $R/acc_cpu_3d_fresh_bvh.json ]; then
    python - <<'EOF'
import json
base = json.load(open("results/r4/acc_cpu_3d_fresh.json"))
bvh = json.load(open("results/r4/acc_cpu_3d_fresh_bvh.json"))
rows = [r for r in base if r["algo"] != "bvh"] + bvh
rows.sort(key=lambda r: r["algo"])
json.dump(rows, open("results/r4/acc_cpu_3d_fresh.json", "w"), indent=1)
print(rows)
EOF
    git add $R/acc_cpu_3d_fresh.json $R/acc_cpu_3d_fresh_bvh.json
    git commit -q -m "Re-measured 3-D fresh bvh trajectory row (quirk-curve order at HEAD)"
fi

# ---- stage 2: force-error fresh, softening-matched oracle ------------
ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 --force-error \
    --out $R/force_err_fresh.json > /tmp/force_fresh.log 2>&1
git add $R/force_err_fresh.json
git commit -q -m "Force-error accuracy n=131072 fresh, softening-matched oracle (auto-harvest)"

# ---- stage 3: force-error evolved ------------------------------------
ACC_PLATFORM=cpu python scripts/accuracy_study.py 131072 0 --force-error \
    --evolved --out $R/force_err_evolved.json > /tmp/force_evolved.log 2>&1
git add $R/force_err_evolved.json
git commit -q -m "Force-error accuracy n=131072 evolved, softening-matched oracle (auto-harvest)"

# ---- stage 4: full suite ---------------------------------------------
timeout 3600 python -m pytest tests/ -q > /tmp/pytest_full.log 2>&1
tail -3 /tmp/pytest_full.log
