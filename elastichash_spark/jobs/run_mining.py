"""spark-submit job #5: corpus-scale batched search (the mining regime).

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/run_mining.py \
        --index /path/index --queries /path/queries_parquet \
        --output /path/results_parquet [--k 10] [--queries-per-bucket 1024]

Queries parquet schema: (qid long, text string) — potentially corpus-sized
(query-by-every-document: dedup-by-search, MLT sweeps). The query set is
never collected to the driver: ``query.search_mining`` runs it through a
(query-bucket x doc-shard) grid as pure dataflow, rank-identical per query
to ``run_queries.py``. Results land as parquet (qid, rank, docID, score) —
mining outputs are batch-sized, so unlike run_queries they are written, not
printed; the one-line JSON carries counts and throughput only.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries-per-bucket", type=int, default=1024)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("elastichash-mining")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from elastichash_spark.query import search_mining

    queries = spark.read.parquet(args.queries).select("qid", "text")
    n_queries = queries.count()
    t0 = time.time()
    res = search_mining(
        spark, args.index, queries, k=args.k,
        queries_per_bucket=args.queries_per_bucket,
    )
    res.write.mode("overwrite").parquet(args.output)
    wall = time.time() - t0
    n_rows = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "run_mining",
                "wall_sec": wall,
                "queries": n_queries,
                "result_rows": n_rows,
                "queries_per_sec": round(n_queries / wall, 1) if wall else None,
                "k": args.k,
            }
        )
    )


if __name__ == "__main__":
    main()
