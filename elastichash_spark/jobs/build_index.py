"""spark-submit job #1: build the inverted index.

Usage:
    spark-submit --py-files elastichash_spark.zip \
        elastichash_spark/jobs/build_index.py \
        --input /path/transcripts_parquet --output /path/index \
        [--num-shards 64] [--salt-buckets 4] [--block-size 128] [--no-resume] \
        [--stopwords the,a,an] [--stem] [--synonyms db=database,k8s=kubernetes]

Prints one JSON line with build metrics (turns/sec throughput — the
successor of the reference's per-image wall-time printout,
``/root/reference/dh/tools/import_csv.py:379-385``).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--num-shards", type=int, default=64)
    ap.add_argument("--salt-buckets", type=int, default=4)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--run-partitions", type=int, default=0)
    ap.add_argument(
        "--doc-order", default="doclen", choices=["key", "doclen"],
        help="docID assignment: 'doclen' (impact-ordered; enables block-max "
             "pruning - the production default) or 'key' (corpus-key order)",
    )
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--run-id", default="run0")
    # analyzer chain (ES `analysis` analogue; pinned in tokenize.py):
    # carried in the index config/meta, so queries analyze identically
    ap.add_argument(
        "--stopwords", default="",
        help="comma-separated stop list, dropped after lowercase+split")
    ap.add_argument(
        "--stem", action="store_true",
        help="apply the pinned s-stemmer after the stop filter")
    ap.add_argument(
        "--synonyms", default="",
        help="comma-separated surface=canonical pairs, applied post-stem "
             "(index-time contract-merging form)")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("elastichash-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from elastichash_spark.build import IndexConfig, build_index

    synonyms = []
    for pair in filter(None, args.synonyms.split(",")):
        if "=" not in pair:
            ap.error(f"--synonyms pair {pair!r} is not surface=canonical")
        k, v = pair.split("=", 1)
        synonyms.append((k.strip(), v.strip()))
    cfg = IndexConfig(
        num_shards=args.num_shards,
        salt_buckets=args.salt_buckets,
        block_size=args.block_size,
        run_partitions=args.run_partitions,
        doc_order=args.doc_order,
        stopwords=tuple(filter(None, (w.strip() for w in args.stopwords.split(",")))),
        stem=args.stem,
        synonyms=tuple(synonyms),
    )
    t0 = time.time()
    meta = build_index(
        spark, args.input, args.output, cfg,
        resume=not args.no_resume, run_id=args.run_id,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "job": "build_index",
                "wall_sec": wall,
                "turns": meta["n_docs"],
                "turns_per_sec": meta["n_docs"] / wall if wall else None,
                "n_terms": meta["n_terms"],
                "config": meta["config"],
            }
        )
    )


if __name__ == "__main__":
    main()
