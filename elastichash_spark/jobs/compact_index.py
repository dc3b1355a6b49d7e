"""spark-submit job #4: post-append index maintenance.

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/compact_index.py \
        --index /path/index [--refresh-only | --vacuum] \
        [--run-id compact-2026-08-18]

Default: full merge compaction (``append.compact_index``) — fold every
append generation's postings into the base shard layout and recompute exact
per-block bounds under merged statistics, restoring fresh-build pruning
economics without re-tokenizing the corpus. ``--refresh-only`` runs the
cheaper bounds-only pass (``append.refresh_bounds``) — exact ``max_impact``
under current stats, layout untouched (measured: the post-append pruning gap
is mostly structural, so prefer the full compaction unless postings I/O is
the constraint). ``--vacuum`` drops the finished build's run-stage
intermediates (``build.vacuum_build_intermediates`` — ~55% of on-disk
footprint; driver-only, no Spark job). All are single-writer ops; the
first two idempotent per --run-id, vacuum idempotent outright.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--refresh-only", action="store_true")
    ap.add_argument("--vacuum", action="store_true")
    ap.add_argument("--run-id", default="compact")
    args = ap.parse_args()

    if args.vacuum:
        # driver-only filesystem op — no SparkSession, no jobs
        from elastichash_spark.build import vacuum_build_intermediates

        t0 = time.time()
        out = vacuum_build_intermediates(args.index)
        print(json.dumps({"job": "vacuum_build_intermediates",
                          "wall_sec": time.time() - t0, **out}))
        return

    spark = (
        SparkSession.builder.appName("elastichash-compact")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from elastichash_spark.append import compact_index, refresh_bounds

    t0 = time.time()
    if args.refresh_only:
        out = refresh_bounds(spark, args.index, run_id=args.run_id)
        job = "refresh_bounds"
    else:
        out = compact_index(spark, args.index, run_id=args.run_id)
        job = "compact_index"
    print(json.dumps({"job": job, "wall_sec": time.time() - t0, **out}))


if __name__ == "__main__":
    main()
