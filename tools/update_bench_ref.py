#!/usr/bin/env python3
"""Regenerate BENCH_REF.json from a designated clean bench run — with the
same no-silent-drift discipline update_ledger.sh enforces for query
counts (round-16 verdict ask #8), CANARY-NORMALIZED since round 17
(round-16 verdict ask #3).

Usage:
  python3 tools/update_bench_ref.py <run.json> [--note "why rows moved"]
                                    [--ref BENCH_REF.json] [--dry-run]

<run.json> is a full-fidelity Bench record (SPARK_GRAFT_BENCH_OUT file:
{"queries": {...}, "sf": ..., "failures": [...], "canary": {...}})
measured on a quiet host. The tool:

  * Adjudicates drift on the LAYERED basis (DESIGN §8, round 18):
    preferred is the MEDIAN of per-row run/ref ratios, computed locally
    against the exact reference being updated — immune to the canary's
    sample variance AND to a slow subset dominating suite time (a sum
    ratio would self-absolve it). A suite-level median move beyond 1.5x
    that the canary does not corroborate REFUSES outright (the
    uniform-regression tripwire: only the data-free canary can tell a
    host window from everything regressing together). Records without
    shared rows fall back to canary ratios, then raw wall-clock.
  * REFUSES (exit 1) when any existing row's (normalized) value moved
    by more than 1.5x in either direction unless --note explains it —
    a reference refresh must never silently absorb a regression (or
    silently erase one); the note and the per-row old->new values are
    appended to the "changes" ledger inside BENCH_REF.json itself.
  * REFUSES when the run's scale differs from the reference's, when the
    run recorded failures, or when a previously-referenced query is
    missing from the run (a registry change needs --note too).
  * New queries are added freely (listed); unchanged/small-drift rows
    are refreshed in place. The run's canary median is promoted into
    the reference's top-level "canary" so Bench's in-run 3x guard can
    normalize against it.
  * ASSET rows (round 20): the run's "assets" object (asset:*/stream:*
    cold-build rows) is carried into the reference and adjudicated with
    the same 1.5x gate, normalized by the ASSET-phase median when >=5
    asset rows are shared (the cold builds run in a different window
    than the warm query passes). A run with asset_failures, or one
    missing the asset tier a reference carries, REFUSES.
"""
import argparse
import datetime
import json
import sys

DRIFT = 1.5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run")
    ap.add_argument("--note", default=None)
    ap.add_argument("--ref", default="BENCH_REF.json")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.run) as f:
        run = json.load(f)
    with open(args.ref) as f:
        ref = json.load(f)

    problems = []
    if run.get("sf") != ref.get("sf"):
        problems.append(
            f"scale mismatch: run sf={run.get('sf')!r} vs ref sf={ref.get('sf')!r}")
    failures = run.get("failures") or []
    if failures:
        problems.append(f"run recorded failures: {failures}")
    asset_failures = run.get("asset_failures") or []
    if asset_failures:
        problems.append(
            f"run recorded asset failures (their values are time-to-"
            f"failure, unpromotable): {asset_failures}")
    if problems:
        for p in problems:
            print(f"REFUSE: {p}", file=sys.stderr)
        return 1

    old = ref.get("queries", {})
    new = run.get("queries", {})
    ref_canary = ref.get("canary")
    run_canary = (run.get("canary") or {}).get("median")
    # different canary PLANS are different clocks — fall back to
    # wall-clock drift rather than scale by incomparable seconds; an
    # ABSENT plan on either side is a mismatch, not a match (a
    # plan-less record predates plan stamping, review r17b)
    ref_plan = ref.get("canary_plan")
    run_plan = (run.get("canary") or {}).get("plan")
    plans_ok = ref_plan is not None and ref_plan == run_plan
    normalized = bool(ref_canary) and bool(run_canary) and plans_ok
    # PREFERRED basis (round 18, DESIGN §8's layered adjudication): a
    # window normalizer computed LOCALLY against the reference being
    # updated — the record's own suite_scale may have been measured
    # against an older reference (review r18), and the canary's sample
    # variance once flagged 43 rows whose walls were at reference
    # level. MEDIAN of per-row ratios, not the sum ratio: a regressed
    # subset dominating suite time would drag a sum-based scale and
    # self-absolve (review r18); the median resists until more than
    # half the ROWS move together — and that case is caught by the
    # canary tripwire below.
    shared_rows = [n for n in old if n in new and old[n] > 0]
    _ratios = sorted(new[n] / old[n] for n in shared_rows)
    med_scale = _ratios[len(_ratios) // 2] if _ratios else 1.0
    # The median basis needs enough shared rows to mean anything: with
    # 1-3 shared rows the median self-normalizes (one shared row makes
    # t_new/med_scale == t_old identically, so that row can never trip
    # the gate, and the median row is definitionally unflaggable).
    # Require >= 5 shared rows; otherwise fall back to canary-ratio or
    # raw wall-clock (ADVICE r18).
    use_suite = len(_ratios) >= 5

    # MEDIAN-vs-MEDIAN on both sides: the reference stores only its
    # run's canary median, so normalizing the new side by PER-ROW
    # canaries would read within-run canary variance as drift — the
    # first live refresh flagged 8 rows whose seconds were IDENTICAL
    # because their end-of-suite canary samples ran fast (review r17b).
    # The per-row ratios in the record remain the adjudication tool for
    # rows the IN-RUN guard flags (each row against its own window);
    # this gate compares stable run-level normalizations.
    def ratio_old(name):
        return old[name] / ref_canary

    def ratio_new(name):
        return new[name] / run_canary

    moved = {}
    for name, t_old in sorted(old.items()):
        if name not in new:
            moved[name] = [t_old, None]  # removed query: needs a note too
            continue
        t_new = new[name]
        if use_suite:
            a, b = t_old, t_new / med_scale
        elif normalized:
            a, b = ratio_old(name), ratio_new(name)
        else:
            a, b = t_old, t_new
        lo, hi = sorted((max(a, 1e-9), max(b, 1e-9)))
        if hi / lo > DRIFT:
            moved[name] = [t_old, t_new]

    added = sorted(set(new) - set(old))

    # Asset tier (round 20, verdict r19 #1): the asset:*/stream:* rows
    # ride the same reference with the same drift gate. Their window
    # normalizer is the ASSET-phase median (the cold builds run before
    # the warm-up pass, so their host window can differ from the query
    # phase's); with fewer than 5 shared asset rows the basis falls back
    # down the same ladder as queries (query suite-median -> canary ->
    # raw wall). Asset moves land in the same `moved` dict (the name
    # prefixes keep the tiers unambiguous) and the same changes ledger.
    old_assets = ref.get("assets", {})
    new_assets = run.get("assets", {})
    _aratios = sorted(new_assets[n] / old_assets[n]
                      for n in old_assets
                      if n in new_assets and old_assets[n] > 0)
    asset_scale = _aratios[len(_aratios) // 2] if _aratios else 1.0
    use_asset_suite = len(_aratios) >= 5
    for name, t_old in sorted(old_assets.items()):
        if name not in new_assets:
            if new_assets:  # a run with NO asset tier at all (pre-round-
                moved[name] = [t_old, None]  # 20 record) drops pins with
            continue                         # the note below, not row-by-row
        t_new = new_assets[name]
        if use_asset_suite:
            a, b = t_old, t_new / asset_scale
        elif use_suite:
            a, b = t_old, t_new / med_scale
        elif normalized:
            a, b = t_old / ref_canary, t_new / run_canary
        else:
            a, b = t_old, t_new
        lo, hi = sorted((max(a, 1e-9), max(b, 1e-9)))
        if hi / lo > DRIFT:
            moved[name] = [t_old, t_new]
    if old_assets and not new_assets:
        print("REFUSE: reference carries asset rows but the promoted run "
              "has no assets object (subset or SPARK_GRAFT_BENCH_ASSETS=0 "
              "run?) — promote a full run.", file=sys.stderr)
        return 1
    added_assets = sorted(set(new_assets) - set(old_assets))

    # Uniform-move tripwire: NO whole-suite normalizer can tell "host
    # window" from "everything regressed together" — only the data-free
    # canary is immune to query-plan changes. A suite-level median move
    # beyond the gate that the canary does NOT corroborate demands a
    # note even when no individual row moved relative to the median.
    suite_unexplained = None
    if use_suite and (med_scale > DRIFT or med_scale < 1 / DRIFT):
        canary_window = (run_canary / ref_canary) if normalized else None
        corroborated = (canary_window is not None and
                        1 / DRIFT < med_scale / canary_window < DRIFT)
        if not corroborated:
            suite_unexplained = (med_scale, canary_window)
    if suite_unexplained and not args.note:
        m, cw = suite_unexplained
        print(f"REFUSE: suite-level median ratio {m:.2f} moved beyond "
              f"{DRIFT}x and the canary does not corroborate it "
              f"(canary window: {cw}) — a uniform regression would look "
              "exactly like this; --note required.", file=sys.stderr)
        return 1

    if moved and not args.note:
        basis = ("suite-scale-corrected wall" if use_suite
                 else "canary-normalized ratio" if normalized else "wall-clock")
        print(f"REFUSE: {len(moved)} row(s) moved >{DRIFT}x by {basis} "
              "(or vanished) and no --note was given:", file=sys.stderr)
        for name, (a, b) in sorted(moved.items()):
            print(f"  {name}: {a} -> {b}", file=sys.stderr)
        print("Re-run with --note 'reason' to record the change in the "
              "reference's ledger.", file=sys.stderr)
        return 1

    out = {
        "sf": ref.get("sf"),
        "note": ref.get(
            "note",
            "per-query steady-state reference for Bench's 3x guard; "
            "refresh via tools/update_bench_ref.py"),
        "queries": {k: new[k] for k in sorted(new)},
    }
    if new_assets:
        out["assets"] = {k: new_assets[k] for k in sorted(new_assets)}
    if run_canary:
        out["canary"] = run_canary
        plan = (run.get("canary") or {}).get("plan")
        if plan:
            out["canary_plan"] = plan
    # A canary-less promoted run must NOT carry the old reference canary
    # forward: the fresh rows were measured in a different host window,
    # so pairing them with a stale canary silently mis-scales the 3x
    # guard's ratio normalization. Omit canary entirely — Bench falls
    # back to wall-clock comparison, which is at least honest.
    elif ref_canary:
        print("note: promoted run has no canary; dropping the stale "
              f"reference canary {ref_canary} (guard falls back to "
              "wall-clock until a canaried run is promoted)")
    changes = list(ref.get("changes", []))
    if moved:
        entry = {
            "date": datetime.date.today().isoformat(),
            "note": args.note,
            "basis": ("suite-median" if use_suite else "ratio" if normalized else "seconds"),
            "rows": {k: moved[k] for k in sorted(moved)},
        }
        if any(k.startswith(("asset:", "stream:")) for k in moved):
            entry["asset_basis"] = ("asset-median" if use_asset_suite
                                    else entry["basis"])
        changes.append(entry)
    if changes:
        out["changes"] = changes

    basis = "suite-median" if use_suite else "ratio" if normalized else "seconds"
    asset_basis = ("asset-median" if use_asset_suite else basis)
    print(f"rows: {len(old)} -> {len(new)} "
          f"(added {len(added)}, moved>{DRIFT}x-by-{basis} {len(moved)}; "
          f"canary ref={ref_canary} run={run_canary})")
    print(f"asset rows: {len(old_assets)} -> {len(new_assets)} "
          f"(added {len(added_assets)}, basis {asset_basis}, "
          f"asset_scale {asset_scale:.3f})")
    for name in added:
        print(f"  added {name}: {new[name]}")
    for name in added_assets:
        print(f"  added {name}: {new_assets[name]}")
    for name, (a, b) in sorted(moved.items()):
        print(f"  moved {name}: {a} -> {b}")
    if args.dry_run:
        print("dry run — reference not written")
        return 0
    with open(args.ref, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"wrote {args.ref}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
