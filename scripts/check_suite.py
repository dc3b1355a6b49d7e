"""Local stand-in for the driver's correctness gate: run every suite query
through Spark AND its DuckDB oracle on the same parquet tables, compare
row counts, column names/types, and order-insensitive values.

Usage: python scripts/check_suite.py [sf_dir] [only_query ...]
       python scripts/check_suite.py --rotation [next_round]

--rotation: certification-age audit (no Spark). The driver records only the
first SUITE_CERT.json["window"] keys of suite.queries(); this mode asserts
that ordering leaves no entry stale — every entry must either sit inside
the window (it will be certified in the coming round) or hold a driver-green
row from the immediately preceding round. Run it before committing any
queries() reordering; wired into the round checklist.
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


def check_rotation(next_round: int | None = None) -> int:
    """Assert no suite entry's last driver-green round is more than one
    round old, given the planned queries() ordering. Returns #violations."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cert = json.load(open(os.path.join(root, "SUITE_CERT.json")))
    window, last = int(cert["window"]), cert["last_certified"]
    if next_round is None:
        next_round = max(last.values(), default=0) + 1
    from elastichash_spark import suite

    keys = list(suite.queries())
    in_window = set(keys[:window])
    bad = []
    pending = []  # never-certified entries below the boundary
    for i, k in enumerate(keys):
        if k in in_window:
            continue  # will get a driver row next round
        got = last.get(k, 0)
        if got == 0:
            pending.append((i, k))
        elif got < next_round - 1:
            bad.append((k, got))
    # A round may add more new entries than the window has free slots
    # (every slot is owed to a never-certified or stale entry). Those
    # overflow entries are NEVER-certified but not a rotation failure —
    # PROVIDED they sit contiguously at the head of the below-boundary
    # region, i.e. they are first into the next round's window. Anything
    # never-certified deeper in the tail is a real violation: it would
    # wait two or more rounds.
    for j, (i, k) in enumerate(pending):
        if i != window + j:
            bad.append((k, 0))
        else:
            print(f"PENDING {k}: new entry at position {i}, first into the "
                  f"round-{next_round + 1} window")
    for k, got in sorted(bad):
        print(f"STALE {k}: last driver-green round {got or 'never'}, "
              f"outside the {window}-entry window for round {next_round}")
    print(f"rotation: {len(keys)} entries, window {window}, "
          f"{len(keys) - len(in_window)} outside, {len(pending)} pending, "
          f"{len(bad)} stale")
    return len(bad)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--rotation":
        nr = int(sys.argv[2]) if len(sys.argv) > 2 else None
        sys.exit(1 if check_rotation(nr) else 0)
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
