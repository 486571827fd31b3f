"""Simulates the driver's verify loop: entry() smoke + queries() vs
oracle_sql() via DuckDB at a given sf dir (order-insensitive value
compare). Usage: python tools/driver_sim.py [sf_dir [name,name,...]] —
the optional comma-list restricts to those queries (and skips the
entry() smoke) for fast iteration on a new oracle."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from searchengine_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("driver-sim", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if only is None:
        print("== entry() smoke ==")
        edf = entrymod.entry(spark)
        erows = edf.collect()
        print(f"entry rows={len(erows)} schema={edf.schema.simpleString()}")
        for r in erows:
            print("  ", r)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if only is not None:
        missing = only - set(qs)
        if missing:
            print("unknown query names:", sorted(missing))
            return 2
        qs = {k: v for k, v in qs.items() if k in only}
    fails = []
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [r.asDict() for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(srows)} rows")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        a = norm(srows, scols)
        b = norm(orows, ocols)
        ok = ok_cols and a == b
        print(
            f"{name:20s} spark={len(a):6d} duck={len(b):6d} cols_ok={ok_cols} "
            f"match={ok}"
        )
        if not ok:
            fails.append(name)
            sa, sb = set(a), set(b)
            for x in list(sa - sb)[:3]:
                print("   spark-only:", x)
            for x in list(sb - sa)[:3]:
                print("   duck-only :", x)
    spark.stop()
    if fails:
        print("FAILED:", fails)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
