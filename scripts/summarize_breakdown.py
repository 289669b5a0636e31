#!/usr/bin/env python
"""Summarize probe_r4_breakdown JSONL outputs into a per-phase table.

Feeds: BASELINE.md per-phase breakdown table (pairs with probe_r4_breakdown.py).

Phase cost = step("none") - step(ablate-that-removes-the-phase); ablates
that keep a build but skip an eval (nlist/rlist) isolate build vs eval.
Usage: summarize_breakdown.py [--latest] /tmp/bd_oct3.json [...]

--latest: when a jsonl holds re-runs of the same case (e.g. pre- and
post-flip arms appended over a round), keep only the LAST occurrence of
each (algo, dim, evolved, ablate) instead of the default min() — use it
to summarize the current-HEAD arm set.
"""

import json
import sys


def load(path, latest=False):
    # one jsonl may interleave engines/configs: group by (algo, dim,
    # evolved) so octree and bvh ablates never collide in one table
    groups = {}
    with open(path) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "sec" not in rec:
                print(f"  (error case: {rec.get('ablate')}: "
                      f"{rec.get('error', '?')[:120]})")
                continue
            g = (rec.get("algo", "?"), rec.get("dim", "?"),
                 rec.get("evolved", "?"))
            best = groups.setdefault(g, {})
            key = rec["ablate"]
            if latest:
                best[key] = rec["sec"]
            else:
                best[key] = min(best.get(key, 1e9), rec["sec"])
    return groups


def main():
    argv = sys.argv[1:]
    latest = "--latest" in argv
    for path in [a for a in argv if a != "--latest"]:
        print(f"== {path}" + (" (latest arms)" if latest else ""))
        for (algo, dim, evolved), b in sorted(load(path, latest).items()):
            print(f" -- {algo} dim={dim} evolved={evolved}")
            if "none" not in b:
                print("  no baseline 'none' case");  continue
            base = b["none"]
            print(f"  total step            {base*1e3:8.1f} ms")
            for ab, sec in sorted(b.items()):
                if ab == "none":
                    continue
                print(f"  -{ab:<12} -> {sec*1e3:8.1f} ms   "
                      f"phase ~{(base-sec)*1e3:+7.1f} ms")
            # derived: t(nlist) keeps the list build but skips the eval,
            # so eval = t(none) - t(nlist); t(near) drops the whole
            # chain, so build = t(nlist) - t(near)
            for evalab, listab, name in (("near", "nlist", "near"),
                                         ("resid", "rlist", "resid")):
                if evalab in b and listab in b:
                    print(f"  [{name}: eval ~{(base - b[listab])*1e3:.1f}"
                          f" ms, list-build ~"
                          f"{(b[listab] - b[evalab])*1e3:.1f} ms]")


if __name__ == "__main__":
    main()
