#!/usr/bin/env python3
"""sf~6.7 DUPLICATE-POOR ntile-snap fixture (r16, verdict #3): fire the
±1-rank snap repair on REAL GK output, not only on QualitySpec's
injected mis-snaps.

Why sf3 had nothing to repair: GK with accuracy A guarantees rank error
<= n/A, so for n well under A = 1e7 the returned cutpoint is EXACTLY the
ceil(q*n) statistic on duplicate-poor data, and duplicate-RICH data
(sf1/sf3 money values repeat heavily) absorbs the remaining freedom
inside a duplicate run. Both suppressors are removed here:

  - n = 9,999,999 rows (just inside the snap's n <= accuracy envelope,
    rank slack n/A = 0.9999999 -- "sf~6.7" in orders terms): the regime
    where GK's realized error reaches a full rank.
  - o_totalprice is REPLACED by a duplicate-poor deterministic price:
    h = (o_orderkey * 2654435761) mod 2^32 (Knuth multiplicative hash),
    cents = (h * 49_999_900) >> 32, price = cents/100 + 1 -- ~50M
    distinct 2-decimal values for 10M rows, so virtually every value has
    a unique rank. Integer arithmetic end-to-end; the parquet double is
    the one value both engines read, and 2-decimal money casts stay off
    rounding boundaries exactly like the stock data.

Measured on this construction (NOTES r16): GK returns the rank-(k-1)
neighbor for ALL THREE quartiles (k > le -> the snap's `next` branch),
so a green w_ntile_approx gate on this fixture proves the live repair,
and a probe of the raw sketch shows cuts != exact statistics.

Construction: 7 key-shifted copies of testdata_sf1's orders (the
gen_sf1/gen_sf3 replication rule), sliced to 9,999,999 rows, prices
rewritten as above. The other 9 tables are copied verbatim
(tools/selfcheck.py registers views for all 10; the targeted query
reads only orders).

Usage: python3 tools/gen_sf7.py [outdir=/root/repo/testdata_sf7]
(run tools/gen_sf1.py first; output is gitignored and regenerable
bit-identically.)
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/repo/testdata_sf1"
COPIES = 7
N_ROWS = 9_999_999


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


def duplicate_poor_prices(keys):
    out = []
    for k in keys:
        h = (k * 2654435761) % (1 << 32)
        cents = (h * 49_999_900) >> 32
        out.append(cents / 100.0 + 1.0)
    return pa.array(out, type=pa.float64())


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf7"
    import os
    os.makedirs(outdir, exist_ok=True)
    orders = replicate(pq.read_table(f"{SRC}/orders.parquet"),
                       ["o_orderkey"]).slice(0, N_ROWS)
    keys = orders.column("o_orderkey").to_pylist()
    idx = orders.column_names.index("o_totalprice")
    orders = orders.set_column(idx, "o_totalprice",
                               duplicate_poor_prices(keys))
    pq.write_table(orders, f"{outdir}/orders.parquet")
    n_distinct = len(set(orders.column("o_totalprice").to_pylist()))
    print(f"orders: {orders.num_rows} rows, {n_distinct} distinct prices "
          f"(dup-poor: {n_distinct / orders.num_rows:.4f})")
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{outdir}/{t}.parquet")
        print(f"{t}: copied verbatim")


if __name__ == "__main__":
    main()
