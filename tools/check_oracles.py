"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin on the same
sf dir, compare row count, column names, and an order-insensitive
value hash. Usage: python tools/check_oracles.py [sf_dir] [only...]"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from news_crawler_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import datetime as dt
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ansi = os.environ.get("ORACLE_ANSI", "")
    extra = {"spark.sql.ansi.enabled": ansi} if ansi else None
    spark = get_spark(cores=8, shuffle_partitions=8, extra_conf=extra)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_bad += 1
            continue
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(rows)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            res = con.execute(os_[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_bad += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if not problems and value_hash(cols, rows) != value_hash(ocols, orows):
            problems.append("value-hash mismatch")
            # show a sample diff
            a = {"\x1f".join(norm_cell(r[i]) for i in sorted(range(len(cols)), key=lambda i: cols[i])) for r in rows}
            b = {"\x1f".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows}
            for x in list(a - b)[:2]:
                problems.append(f"  spark-only: {x[:160]}")
            for x in list(b - a)[:2]:
                problems.append(f"  oracle-only: {x[:160]}")
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"OK   {name}: {len(rows)} rows in {time.time()-t0:.1f}s")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
