"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows, colnames) -> str:
    """Order-insensitive: sort columns by name, normalize values to strings,
    sort rows, md5."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    norm_rows = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            elif v is None:
                vals.append("<null>")
            else:
                vals.append(str(v))
        norm_rows.append("\x1f".join(vals))
    norm_rows.sort()
    return hashlib.md5("\x1e".join(norm_rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import duckdb

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app="check-oracle", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows-only ({len(srows)} rows)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            hs = value_hash(srows, scols)
            hd = value_hash(drows, dcols)
            if hs != hd:
                problems.append("value-hash mismatch")
                sset = {tuple(sorted(zip(scols, r), key=lambda x: x[0]))
                        for r in srows}
                dset = {tuple(sorted(zip(dcols, r), key=lambda x: x[0]))
                        for r in drows}
                ex_s = list(sset - dset)[:2]
                ex_d = list(dset - sset)[:2]
                if ex_s:
                    problems.append(f"spark-only e.g. {ex_s}")
                if ex_d:
                    problems.append(f"duck-only e.g. {ex_d}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
