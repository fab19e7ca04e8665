#!/usr/bin/env python3
"""Seed (or refresh) per-query bench floors WITH machine context.

Usage:
  python3 tools/floor_seed.py <query[,query...]> [--reps N] [--sf DIR]
      [--force-replace --note "cause"] [--round RN]

Runs graft.Bench restricted to the named queries (SPARK_GRAFT_BENCH_ONLY,
min-of-N via SPARK_GRAFT_BENCH_REPS), then:

  - MIN-merges the measured values into BENCH_FLOOR.json (floors only move
    DOWN; --force-replace moves one UP and demands a --note naming the code
    cause — raising a floor to a slow session launders real regressions);
  - appends one context record per seeded query to BENCH_FLOOR_CONTEXT.json
    (r15, verdict #5): load averages before/after the run, rep count, how
    many queries shared the JVM (warmth), wall time, and the note. The r14
    dedup-cluster ambient-drift adjudication reconstructed exactly these
    facts by hand from shell history; recording them at seed time makes the
    next ambient episode mechanically detectable instead of forensic.

BENCH_FLOOR.json stays a flat name->seconds map — the driver and
graft.Bench.loadFloor parse it as such; context lives in the sibling file.
FloorConsistencySpec pins the pairing (no orphaned context keys).
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR = os.path.join(ROOT, "BENCH_FLOOR.json")
CONTEXT = os.path.join(ROOT, "BENCH_FLOOR_CONTEXT.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--force-replace", action="store_true",
                    help="allow a floor to move UP (requires --note)")
    ap.add_argument("--note", default="",
                    help="cause for the seed (required with --force-replace)")
    ap.add_argument("--round", dest="rnd", default="",
                    help="round tag for the context record, e.g. r15")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]
    if args.force_replace and not args.note:
        sys.exit("--force-replace requires --note naming the code cause")

    load_before = os.getloadavg()
    t0 = time.time()
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_ONLY=",".join(names),
               SPARK_GRAFT_BENCH_REPS=str(args.reps),
               SPARK_GRAFT_SF_DIR=args.sf)
    # floors are only comparable under the driver's config
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    out = subprocess.run(["sbt", "runMain graft.Bench"], env=env,
                         cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0
    load_after = os.getloadavg()
    # the "queries" metric line carries the COMPLETE per-query map (the
    # final "total" line's queries field is the headline subset only)
    allq, total_line = {}, None
    for ln in out.stdout.splitlines():
        if ln.startswith('{"metric"'):
            rec = json.loads(ln)
            if rec.get("metric") == "queries":
                allq = rec["queries"]
            if rec.get("metric") == "total":
                total_line = rec
    if total_line is None:
        print(out.stdout[-3000:], file=sys.stderr)
        sys.exit("no Bench summary line found (run failed?)")
    bench = dict(total_line, queries=allq)
    measured = {q: allq[q] for q in names if q in allq}
    missing = [q for q in names if q not in measured]
    if missing:
        sys.exit(f"queries produced no measurement (failed?): {missing}")

    floors = json.load(open(FLOOR))
    ctx = json.load(open(CONTEXT)) if os.path.exists(CONTEXT) else {}
    for q, v in sorted(measured.items()):
        old = floors.get(q)
        if old is None or v < old:
            floors[q] = round(v, 4)
            action = "seeded" if old is None else f"lowered {old} -> {v:.4f}"
        elif args.force_replace:
            floors[q] = round(v, 4)
            action = f"FORCE-replaced {old} -> {v:.4f} ({args.note})"
        else:
            action = f"kept {old} (measured {v:.4f})"
        rec = {
            "sec": round(v, 4),
            "floor_after": floors[q],
            "action": action,
            "reps": args.reps,
            "queries_in_jvm": len(bench.get("queries", {})),
            "warm": "q1_agg warms the session; min-of-reps within one JVM",
            "load1_before": round(load_before[0], 2),
            "load5_before": round(load_before[1], 2),
            "load1_after": round(load_after[0], 2),
            "wall_sec": round(wall, 1),
            "sf": args.sf,
            "round": args.rnd,
            "note": args.note,
        }
        ctx.setdefault(q, []).append(rec)
        print(f"{q}: {action}  [load1 {rec['load1_before']}"
              f"->{rec['load1_after']}]")
    json.dump(dict(sorted(floors.items())), open(FLOOR, "w"), indent=1)
    open(FLOOR, "a").write("\n")
    json.dump(ctx, open(CONTEXT, "w"), indent=1, sort_keys=True)
    open(CONTEXT, "a").write("\n")


if __name__ == "__main__":
    main()
