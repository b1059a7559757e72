"""Local mirror of the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at sf0.01,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their string form — the same
normalization family the driver uses).  Run:

    python -m tests.oracle_harness [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), ",".join(sorted(cols)), h


def run(selected: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from uw_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="oracle-harness", master="local[8]", shuffle_partitions=16)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    names = selected or sorted(qs)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_sig = table_hash(scols, srows)
        if name not in oracles:
            print(f"rows  {name}: {spark_sig[0]} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        duck_sig = table_hash(ocols, orows)
        if spark_sig == duck_sig:
            print(f"MATCH {name}: {spark_sig[0]} rows [{time.time()-t0:.1f}s]")
        else:
            failures += 1
            print(f"MISMATCH {name}: spark={spark_sig} duck={duck_sig}")
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            s_set = {"|".join(normalize_cell(r[i]) for i in order) for r in srows}
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            o_set = {"|".join(normalize_cell(r[i]) for i in oorder) for r in orows}
            for line in sorted(s_set - o_set)[:3]:
                print(f"    spark-only: {line}")
            for line in sorted(o_set - s_set)[:3]:
                print(f"    duck-only:  {line}")
    print(f"\n{failures} failures / {len(names)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(run(sys.argv[1:] or None))
