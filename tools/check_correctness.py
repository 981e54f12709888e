"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [only_prefix...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    from decimal import Decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)   # +0.0 folds -0.0 into 0.0
    if isinstance(v, Decimal):
        return repr(round(float(v), 9) + 0.0)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_lines(cols, rows):
    """Shared normalization for hashing AND the first-diffs display, so
    the printed diff can never disagree with the hash verdict."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows)


def value_hash(cols, rows):
    h = hashlib.sha256()
    for line in norm_lines(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, ".")
    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[16]")
             .appName("check_correctness")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            n_fail += 1
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            n_rowsonly += 1
            print(f"rows {name}: {len(rows)} rows ({time.time()-t0:.1f}s) "
                  "[rows-only]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            n_fail += 1
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:200]}")
            continue
        problems = []
        if sorted(cols) != sorted(ocols):
            problems.append(f"cols {sorted(cols)} != {sorted(ocols)}")
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if not problems:
            h1 = value_hash(cols, rows)
            h2 = value_hash(ocols, orows)
            if h1 != h2:
                # show first diffs (same normalization as the hash)
                s1 = norm_lines(cols, rows)
                s2 = norm_lines(ocols, orows)
                diffs = [(a, b) for a, b in zip(s1, s2) if a != b][:3]
                problems.append(f"value hash; first diffs: {diffs}")
        if problems:
            n_fail += 1
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)[:400]}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
