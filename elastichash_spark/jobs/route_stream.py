"""spark-submit job #7: continuous percolation — route an arriving
transcript stream against stored standing queries.

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/route_stream.py \
        --input /data/incoming --registry /data/registry.parquet \
        --output /data/routed --checkpoint /data/routed_ckpt \
        [--continuous]

Registry parquet schema: (qid long, text string[, min_should_match int]) —
text in the query_string mini-dialect restricted to terms and -negation
(see ``query.percolate``). The registry is read ONCE at job start and
parsed driver-side (bounded by the registry, never the stream); each
deduplicated micro-batch of turns then percolates statelessly, and match
pairs land as parquet under ``batch=<id>`` partitions (replayed batches
overwrite their own partition — exactly-once by the foreachBatch
idempotent-sink protocol). Default is a drain-and-exit
``trigger(availableNow)`` pass; ``--continuous`` leaves the query running
until externally stopped.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--registry", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument(
        "--continuous", action="store_true",
        help="keep the streaming query running instead of the default "
        "drain-and-exit trigger(availableNow) pass",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("elastichash-route")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from elastichash_spark.streaming import ingest

    reg_df = spark.read.parquet(args.registry)
    cols = reg_df.columns
    registry = [
        (r["qid"], r["text"],
         int(r["min_should_match"]) if "min_should_match" in cols
         and r["min_should_match"] is not None else 1)
        for r in reg_df.collect()
    ]
    t0 = time.time()
    q = ingest.route_stream(
        ingest.transcript_stream(spark, args.input), registry,
        args.output, args.checkpoint,
        available_now=not args.continuous,
    )
    q.awaitTermination()
    # If the stream delivered no non-empty batch the sink never created the
    # output directory — report 0 routed pairs instead of dying on the read.
    try:
        n_rows = spark.read.parquet(args.output).count()
    except Exception:
        n_rows = 0
    print(
        json.dumps(
            {
                "job": "route_stream",
                "wall_sec": time.time() - t0,
                "registry_queries": len(registry),
                "routed_pairs": n_rows,
            }
        )
    )


if __name__ == "__main__":
    main()
