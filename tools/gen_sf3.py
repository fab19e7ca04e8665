#!/usr/bin/env python3
"""sf~3 ENVELOPE fixture (r15, verdict #3): exercise guard envelopes
ABOVE the sf1 gate so they are tested, not just documented.

Two scored queries own envelopes whose active regime starts past sf1:

  - w_ntile_approx: the ±1-rank snap's precondition is n <= accuracy
    (1e7, trip at sf~6.6). sf1 exercises n = 1.5M; this fixture's
    3x-replicated orders (n = 4.5M) runs the band machinery at ~half
    the envelope with GK rank slack n/A ~ 0.45 — the regime where the
    snap is load-bearing — while the DuckDB oracle stays exact.
  - ns_fuzzy_prefix_pairs: the sf1 gate swaps in the pigeonhole-blocked
    oracle (the brute O(n^2) levenshtein is hours there). 150k docs is
    the 10x-doc-count class the r13 review re-margined twin ids for
    (offset 1e8 vs max id ~1.5e5), and the 3 text-identical copies give
    every doc cross-copy exact-prefix twins — the largest signature
    buckets any gate has pushed through the blocked oracle.

Construction: 3 copies of testdata_sf1's orders/documents with key
shifts of (max_key + 1) per copy (the gen_sf1 replication rule);
non-key columns repeat, which is safe under the repo's key-tiebroken
determinism discipline and is exactly the stress wanted here. The
remaining 8 tables are copied verbatim (tools/selfcheck.py registers
views for all 10; the targeted queries read only the two above).

Usage: python3 tools/gen_sf3.py [outdir=/root/repo/testdata_sf3]
(run tools/gen_sf1.py first; like sf1, the output is gitignored and
regenerable bit-identically.)
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/repo/testdata_sf1"
COPIES = 3


def replicate(table, keycols):
    shifts = {c: max(table.column(c).to_pylist()) + 1 for c in keycols}
    cols = {}
    for name in table.column_names:
        col = table.column(name)
        parts = []
        for c in range(COPIES):
            if name in keycols:
                parts.append(pa.compute.add(col, c * shifts[name]))
            else:
                parts.append(col)
        cols[name] = pa.concat_arrays(
            [p.combine_chunks() for p in parts])
    return pa.table(cols)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf3"
    import os
    os.makedirs(outdir, exist_ok=True)
    for t, keys in [("orders", ["o_orderkey"]), ("documents", ["doc_id"])]:
        out = replicate(pq.read_table(f"{SRC}/{t}.parquet"), keys)
        pq.write_table(out, f"{outdir}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows (3x {SRC})")
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "embeddings"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{outdir}/{t}.parquet")
        print(f"{t}: copied verbatim")


if __name__ == "__main__":
    main()
