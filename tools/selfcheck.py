"""Emulates the driver's correctness gate: run every __spark_entry__ query
in Spark AND its oracle_sql in DuckDB at a given sf, compare row count,
column names, and exact (order-insensitive) values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # Driver-strict: full-precision repr, NO collapsing.  An int64 85 and
        # a float64 85.0 must hash differently (repr '85' vs '85.0') — the
        # round-1 driver gate failed 5 queries exactly because the old
        # ``%.6g`` canonicalization hid DuckDB HUGEINT→float64 typing drift.
        return repr(float(v))
    if isinstance(v, bool):
        return repr(bool(v))
    if isinstance(v, int):
        return repr(int(v))
    return str(v)


def canon_frame(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from sitemap_scan_spark.session import get_spark

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(got)} rows)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            continue
        gc, gr = canon_frame(got)
        wc, wr = canon_frame(want)
        status = "ok"
        if gc != wc:
            status = f"COLUMN MISMATCH spark={gc} duck={wc}"
        elif len(gr) != len(wr):
            status = f"ROWCOUNT MISMATCH spark={len(gr)} duck={len(wr)}"
        elif gr != wr:
            diff = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b][:3]
            samples = [(gr[i], wr[i]) for i in diff]
            status = f"VALUE MISMATCH at rows {diff}: {samples}"
        tag = "PASS" if status == "ok" else "FAIL"
        if tag == "FAIL":
            failures.append(name)
        print(f"{tag} {name} ({len(gr)} rows, {time.time()-t0:.1f}s)"
              + ("" if status == "ok" else f" — {status[:400]}"))
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
