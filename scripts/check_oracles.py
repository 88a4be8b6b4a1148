"""Self-check: replicate the driver's correctness gate locally.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB over
the same sf parquet tables, then compares row count, sorted-by-name column
sets, and an order-insensitive value hash — the same comparison the driver
records in CORRECTNESS_r{N}.json.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def value_hash(rows, colnames) -> str:
    """Order-insensitive hash: per-row canonical repr over name-sorted
    columns, rows sorted, md5."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.6g}"
            elif isinstance(v, bytes):
                v = v.hex()
            vals.append(repr(v))
        canon.append("|".join(vals))
    canon.sort()
    return hashlib.md5("\n".join(canon).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from ankiocr_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = value_hash(srows, scols)
        oh = value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:24s} {status} rows {len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else sorted(scols)!r} hash {sh}/{oh}"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"  spark cols: {sorted(scols)}\n  duck  cols: {sorted(ocols)}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracles match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
