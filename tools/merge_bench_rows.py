#!/usr/bin/env python3
"""Merge a subset bench run's rows into a committed sweep record.

Usage: merge_bench_rows.py SUBSET_JSON TARGET_JSON

Previous rounds merged new queries' scale points into the BENCH_sf1*
records by hand ("identical subset protocol"); this makes the merge
mechanical and total-consistent: every query/asset/stats row from the
subset run replaces (or adds) the same-named row in the target, and the
headline `value` is adjusted by the delta so the total still equals the
sum of its rows' history. The target's metadata (sf, warm, passes) is
left untouched — the subset run must have been taken with the same
protocol on the same fixture dir (asserted on `sf`).
"""
import json, sys

def main():
    sub_p, tgt_p = sys.argv[1], sys.argv[2]
    sub = json.load(open(sub_p))
    tgt = json.load(open(tgt_p))
    assert sub.get("sf") == tgt.get("sf"), \
        f"fixture mismatch: subset {sub.get('sf')} vs target {tgt.get('sf')}"
    # a partially-failing subset run must not silently contribute its
    # (time-to-failure) timings to a committed sweep record
    assert not sub.get("failures"), \
        f"subset run recorded failures: {sub['failures']} — not merging"
    for q, t in sub.get("queries", {}).items():
        tgt["queries"][q] = t
    for a, t in (sub.get("assets") or {}).items():
        tgt.setdefault("assets", {})[a] = t
    for k, v in (sub.get("stats") or {}).items():
        tgt.setdefault("stats", {})[k] = v
    # per-row canary ratios travel WITH their rows: each ratio is
    # seconds / the canary in force in ITS OWN run, so merging the
    # subset's ratios keeps the drift gate adjudicating changed rows on
    # fresh data instead of the target run's stale ratio (review r17)
    for q, r in (sub.get("ratios") or {}).items():
        tgt.setdefault("ratios", {})[q] = r
    # recompute from the rows rather than accumulating rounded deltas —
    # repeated merges must keep value == sum(queries) exactly
    tgt["value"] = round(sum(tgt["queries"].values()), 3)
    with open(tgt_p, "w") as f:
        json.dump(tgt, f)
    print(f"merged {len(sub.get('queries', {}))} query rows "
          f"(+{len((sub.get('assets') or {}))} assets) into {tgt_p}; "
          f"total {tgt['value']}s")

if __name__ == "__main__":
    main()
