"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
import sycamore_spark as ss  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm_cell(v):
    # Full-precision float repr: the driver hashes exact values, so a local
    # gate at 9 significant digits hides exactly the engine-rounding
    # divergences the driver counts (r2: custom_agg/tpch_q18 were locally
    # "OK" at %.9g while red in CORRECTNESS_r02.json). repr() round-trips
    # IEEE doubles (17 significant digits).
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if v is None:
        return "\0NULL"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def dtype_kind(dtype) -> str:
    # Collapse pandas dtypes to comparable kinds: the driver canonicalizes
    # *typed frames* (Spark .toPandas() vs DuckDB .df()), so a DuckDB HUGEINT
    # rendered as float64 hashes differently from Spark's int64 even when the
    # Python values are identical ints (r3 judge finding: custom_agg/tpch_q18).
    # fetchall() can't see this class — both sides are Python int there.
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def dtype_mismatches(scols, spark_pd, dcols, oracle_pd):
    smap = {c.lower(): dtype_kind(spark_pd.dtypes.iloc[i]) for i, c in enumerate(spark_pd.columns)}
    dmap = {c.lower(): dtype_kind(oracle_pd.dtypes.iloc[i]) for i, c in enumerate(oracle_pd.columns)}
    return [
        (c, smap[c], dmap[c])
        for c in sorted(set(smap) & set(dmap))
        if smap[c] != dmap[c]
    ]


def main():
    spark = ss.init(app_name="parity-check", shuffle_partitions=16)
    con = duckdb.connect()
    for t in entry.__dict__.get("TABLES", None) or (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            sdf.persist()
            srows = [tuple(r) for r in sdf.collect()]
            spark_pd = sdf.toPandas()
            sdf.unpersist()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  [{elapsed:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
            oracle_pd = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        mism = dtype_mismatches(scols, spark_pd, dcols, oracle_pd)
        if mism:
            failures.append(name)
            print(f"FAIL  {name}: pandas dtype mismatch (spark vs oracle): {mism}")
            continue
        sn = norm_rows(scols, srows)
        dn = norm_rows(dcols, drows)
        if sn != dn:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {diffs}")
            continue
        print(f"OK    {name}: {len(srows)} rows  [{elapsed:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")
    spark.stop()


if __name__ == "__main__":
    main()
