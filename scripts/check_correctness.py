"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Type-TAGGED normalization: a Decimal, datetime, or float that happens
    to print like an int must NOT hash equal to that int — the driver's
    hasher is type-sensitive (round-1 lesson: DuckDB SUM → HUGEINT →
    float64 in its fetch path while Spark emits int64, and the untagged
    str() normalizer here masked all 9 failures)."""
    import datetime
    import math
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.6g}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.isoformat()
    if isinstance(v, datetime.date):
        return "d:" + v.isoformat()
    if isinstance(v, int):
        return f"i:{v}"
    return str(v)


def canon_type(t):
    """Canonical label for an Arrow type: strict enough to catch the
    mismatches that break the driver's value hash (hugeint/decimal vs
    int, timestamp vs string), loose on width (int32 == int64 — both
    stringify identically in any normalizer)."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def value_hash(rows, cols):
    import hashlib

    cols_sorted = sorted(cols)
    lines = sorted(
        "\x1f".join(norm_cell(row[c]) for c in cols_sorted) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    ok = fail = rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {
                f.name: canon_type(f.type) for f in sdf.toArrow().schema
            }
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            rows_only += 1
            continue
        try:
            dtab = con.sql(oracles[name]).arrow()
            dcols = dtab.schema.names
            dtypes = {f.name: canon_type(f.type) for f in dtab.schema}
            drows = dtab.to_pylist()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            tmis = {
                c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]
            }
            if tmis:
                problems.append(f"types {tmis}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if not problems:
            hs, hd = value_hash(srows, scols), value_hash(drows, dcols)
            if hs != hd:
                problems.append(f"hash {hs} vs {hd}")
                # show a few differing lines for debugging
                import itertools

                sset = {
                    "\x1f".join(norm_cell(r[c]) for c in sorted(scols)) for r in srows
                }
                dset = {
                    "\x1f".join(norm_cell(r[c]) for c in sorted(dcols)) for r in drows
                }
                for x in itertools.islice(sorted(sset - dset), 3):
                    problems.append(f"  spark-only: {x[:160]}")
                for x in itertools.islice(sorted(dset - sset), 3):
                    problems.append(f"  duck-only:  {x[:160]}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            fail += 1
        else:
            # a 0-row agreement is vacuous — flag it so thresholds that
            # silently select nothing get noticed (found the hard way
            # with embed_cosine_neardup at an impossible 0.99 cosine)
            note = "  [VACUOUS: 0 rows both sides]" if len(srows) == 0 else ""
            print(f"OK    {name}: {len(srows)} rows ({time.time()-t0:.1f}s){note}")
            ok += 1
    print(f"\n{ok} ok, {rows_only} rows-only, {fail} fail")
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
