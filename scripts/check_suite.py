"""Local stand-in for the driver's correctness gate: run every suite query
through Spark AND its DuckDB oracle on the same parquet tables, compare
row counts, column names/types, and order-insensitive values.

Usage: python scripts/check_suite.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def compare(name, spark_df, con, sql):
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns: spark={sorted(got.columns)} duck={sorted(want.columns)}")
    else:
        cols = sorted(got.columns)
        g = [tuple(norm_cell(v) for v in row) for row in got[cols].itertuples(index=False)]
        w = [tuple(norm_cell(v) for v in row) for row in want[cols].itertuples(index=False)]
        if len(g) != len(w):
            problems.append(f"rows: spark={len(g)} duck={len(w)}")
        if sorted(map(repr, g)) != sorted(map(repr, w)):
            sg, sw = sorted(map(repr, g)), sorted(map(repr, w))
            diff = [(a, b) for a, b in zip(sg, sw) if a != b][:3]
            extra_g = [x for x in sg if x not in set(sw)][:3]
            problems.append(f"values differ; first diffs={diff} extra_spark={extra_g}")
    return problems, len(got)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from elastichash_spark.session import get_spark
    from elastichash_spark import suite

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = suite.queries()
    sqls = suite.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in sqls:
                problems, n = compare(name, df, con, sqls[name])
            else:
                n = df.count()
                problems = [] if n >= 0 else ["count failed"]
                problems = problems + ([] if n > 0 else ["WARN: 0 rows (rows-only check)"])
        except Exception as e:
            problems, n = [f"EXCEPTION: {type(e).__name__}: {str(e)[:300]}"], -1
        status = "OK " if not problems else "FAIL"
        if problems:
            fails += 1
        print(f"{status} {name:20s} rows={n:<7d} {time.time()-t0:6.1f}s {problems if problems else ''}")
    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
