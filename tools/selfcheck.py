#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [overrides.json]

Reads <verifyOutDir>/oracle_sql.json, registers each test table as a DuckDB
view over <sfDir>/<table>.parquet, runs every oracle, and diffs it against
the Spark result parquet at <verifyOutDir>/<name>/. Columns are compared
sorted by name (the driver's rule); rows in result order.

The optional overrides file maps query name -> replacement oracle SQL for
LARGE local runs only (the driver's sf0.01 gate always uses the committed
oracle): e.g. at sf1 the brute-force O(n²)-levenshtein fuzzy oracle is
swapped for its pigeonhole-blocked equivalent (proved tuple-identical at
sf0.1, self-guarding via error() on its length precondition — NOTES r12).
Overridden queries are marked in the output so a green line never silently
means "different oracle" without saying so.

Dev tooling only (driver-side python has duckdb/pyarrow); not a build dep.
"""
import json
import math
import os
import struct
import sys

import duckdb

# The oracle-engine version every committed oracle was validated against
# (r16, verdict #6): DuckDB minor releases have changed regex classes,
# rounding, and hash/format semantics before — a silent upgrade would
# misattribute oracle drift to the Spark engine (or worse, silently
# green a divergence both engines share). A version change must be a
# CONSCIOUS act: re-validate the full suite, then bump this pin in the
# same commit. GRAFT_ALLOW_DUCKDB_DRIFT=1 overrides for that
# re-validation run itself.
PINNED_DUCKDB = "1.0.0"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def close(a, b):
    # Driver-grade compare: the driver hash-compares values BIT-exactly,
    # so doubles must match to the bit — Python's == equates -0.0 and
    # +0.0 (and any tolerance hides them entirely), which is exactly the
    # class that shipped agg_regression red in r8. Pack to IEEE bytes.
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return struct.pack(">d", a) == struct.pack(">d", b)
    return a == b


def main():
    if duckdb.__version__ != PINNED_DUCKDB:
        msg = (f"selfcheck: DuckDB {duckdb.__version__} != pinned "
               f"{PINNED_DUCKDB} — oracle semantics are only validated "
               f"against the pin; re-validate the full suite and bump "
               f"PINNED_DUCKDB, or set GRAFT_ALLOW_DUCKDB_DRIFT=1 for "
               f"that re-validation run")
        if os.environ.get("GRAFT_ALLOW_DUCKDB_DRIFT") != "1":
            sys.exit(msg)
        print(f"WARN {msg}", file=sys.stderr)
    print(f"selfcheck: duckdb {duckdb.__version__} (pin {PINNED_DUCKDB})")
    sfdir, vout = sys.argv[1], sys.argv[2]
    overrides = {}
    if len(sys.argv) > 3:
        with open(sys.argv[3]) as f:
            overrides = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{vout}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = overrides.get(name, oracles[name])
        tag = " [overridden oracle]" if name in overrides else ""
        try:
            exp = con.sql(sql)
            exp_cols = exp.columns
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}{tag}")
            n_fail += 1
            continue
        try:
            # Deterministic read of the Spark dump: DuckDB's parallel
            # parquet scan returns row groups in nondeterministic order on
            # large results (invisible at driver SFs — single small row
            # group per file — but it produced 3 phantom FAILs on sf1's
            # 6M/18M-row results in r12). Verify writes each dump
            # coalesce(1) after the canonical total sort (Verify.scala:95)
            # — one part file, globally ordered — so file_row_number alone
            # reconstructs exactly the order Spark emitted; filename is
            # kept in the key for safety should the writer ever go
            # multi-file (NOTES r13).
            got = con.sql(
                f"SELECT * EXCLUDE (filename, file_row_number) "
                f"FROM read_parquet('{vout}/{name}/*.parquet', "
                f"filename=true, file_row_number=true) "
                f"ORDER BY filename, file_row_number")
            got_cols = got.columns
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}{tag}")
            n_fail += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != oracle {sorted(exp_cols)}{tag}")
            n_fail += 1
            continue
        # Type drift the value-compare can't see: DuckDB promotes integer
        # sums to HUGEINT / DECIMAL, which the driver's hash treats as a
        # mismatch even when every value is equal (ns_seq_packing, r02).
        exp_types = {c: t for c, t in zip(exp_cols,
                     [str(t) for t in exp.types])}
        got_types = {c: t for c, t in zip(got_cols,
                     [str(t) for t in got.types])}
        drift = [c for c in exp_cols
                 if ("HUGEINT" in exp_types[c]) != ("HUGEINT" in got_types[c])
                 or ("DECIMAL" in exp_types[c]) != ("DECIMAL" in got_types[c])]
        if drift:
            print(f"FAIL {name}: oracle type drift "
                  f"{[(c, exp_types[c], got_types[c]) for c in drift]}{tag}")
            n_fail += 1
            continue
        # driver compares columns sorted by name
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != oracle {len(exp_rows)}{tag}")
            n_fail += 1
            continue
        bad = None
        for i, (er, gr) in enumerate(zip(exp_rows, got_rows)):
            for j in range(len(eidx)):
                ev, gv = er[eidx[j]], gr[gidx[j]]
                if not close(ev, gv):
                    bad = (i, sorted(exp_cols)[j], ev, gv)
                    break
            if bad:
                break
        if bad:
            i, c, ev, gv = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gv!r} oracle={ev!r}{tag}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got_rows)} rows{tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(oracles)} oracles, {n_pass + n_fail} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
