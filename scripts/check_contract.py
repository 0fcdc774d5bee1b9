"""Replicates the driver's correctness gate locally: run every
__spark_entry__.queries() entry in Spark and its oracle_sql() in DuckDB at a
given sf dir, compare row count + schema-width + order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from sycl_jaccard_spark.session import get_spark  # noqa: E402
from sycl_jaccard_spark.sources.tables import TESTDATA_TABLES  # noqa: E402


def canon(val):
    # Type-tagged: the driver's value hash is dtype-sensitive (an int64 5 and
    # a float64 5.0 hash differently), so 5.0 == 5 must NOT compare equal here
    # — that leniency hid the r1 DuckDB HUGEINT→float oracle dtype bug.
    if val is None:
        return None
    if isinstance(val, bool):
        return ("b", val)
    if isinstance(val, int):
        return ("i", val)
    if isinstance(val, float):
        if math.isnan(val):
            return ("f", "nan")
        return ("f", float(val))
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    return val


def table_multiset(cols: list[str], rows: list[tuple]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only)  [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: schema {sorted(scols)} vs {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            ok = False
        else:
            sm = table_multiset(scols, srows)
            om = table_multiset(ocols, orows)
            if sm != om:
                diff_s = {k: v for k, v in sm.items() if om.get(k) != v}
                diff_o = {k: v for k, v in om.items() if sm.get(k) != v}
                print(f"FAIL  {name}: value mismatch; spark-only={list(diff_s.items())[:3]} "
                      f"oracle-only={list(diff_o.items())[:3]}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(srows)} rows match  [{time.monotonic()-t0:.1f}s]")
        else:
            failures.append(name)
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
