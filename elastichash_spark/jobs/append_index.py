"""spark-submit job #3: append a document batch to a built index.

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/append_index.py \
        --index /path/index --input /path/new_transcripts_parquet \
        --run-id batch-2026-08-17 [--id-cols conv_id,turn_idx]

Idempotent per --run-id (a completed append is skipped on rerun); see
``elastichash_spark.append`` for the statistics-drift contract.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--id-cols", default="conv_id,turn_idx")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("elastichash-append")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from elastichash_spark.append import append_index

    t0 = time.time()
    summary = append_index(
        spark,
        spark.read.parquet(args.input),
        args.index,
        run_id=args.run_id,
        id_cols=args.id_cols.split(","),
        text_col=args.text_col,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "job": "append_index",
                "wall_sec": wall,
                "appended_rows": summary["rows"],
                "n_docs": summary["n_docs"],
                "n_terms": summary["n_terms"],
                "run_id": args.run_id,
            }
        )
    )


if __name__ == "__main__":
    main()
