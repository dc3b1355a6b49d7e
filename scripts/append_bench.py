"""Post-append pruning economics — how much of the block-max pruning
survives N incremental appends.

Appended indexes query under statistics-drift-safe bounds: the stored
``max_impact`` was computed with build-time (idf, avgdl), which every append
changes, so the query kernel rebuilds a safe per-block bound from the
drift-free (max_tf, min_dl) block stats under CURRENT statistics
(query.py safe_bounds path). tf_part(max_tf, min_dl) >= tf_part of any
member posting, but it is looser than the exact per-block impact maximum —
this script measures the price.

Three legs over the SAME corpus and query set (bench tier by default):
- ``full``: one-shot build of the whole corpus (exact max_impact bounds)
- ``appended``: build 60%, then append two 20% batches (safe bounds)
- ``appended+k100``: the appended index at k=100 (deep-k under safe bounds)

Usage: python scripts/append_bench.py [tier]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from elastichash_spark.append import append_index
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    spark = get_spark(app_name="eh-append-bench")
    work = f"/tmp/eh_append_bench_{tier}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus_path = os.path.join(work, "transcripts.parquet")
    gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    # deterministic 60/20/20 split on conv_id hash
    h = F.abs(F.xxhash64("conv_id")) % 10
    base = corpus.where(h < 6)
    b1 = corpus.where((h >= 6) & (h < 8))
    b2 = corpus.where(h >= 8)

    cfg = IndexConfig(num_shards=8, salt_buckets=4, doc_order="doclen")
    full_dir = os.path.join(work, "idx_full")
    app_dir = os.path.join(work, "idx_app")
    build_index(spark, corpus, full_dir, cfg, resume=False)
    build_index(spark, base, app_dir, cfg, resume=False)
    append_index(spark, b1, app_dir, run_id="ab1")
    append_index(spark, b2, app_dir, run_id="ab2")

    qdf = spark.createDataFrame(gen_queries(tier))
    out: dict[str, dict] = {}
    for name, d in (("full", full_dir), ("appended", app_dir)):
        search(spark, d, qdf, "exact").count()  # warmup
        t0 = time.time()
        res, stats = search(spark, d, qdf, "wand", with_stats=True)
        n = res.count()
        wall = time.time() - t0
        out[name] = {
            "result_rows": n,
            "wall_s": round(wall, 2),
            "block_pruning": round(
                1 - stats["blocks_touched"] / stats["blocks_total"], 4
            ),
            "postings_pruning": round(
                1 - stats["postings_touched"] / stats["postings_total"], 4
            ),
        }
    # deep-k leg on the appended index
    k100 = [(int(r.qid), r.text, 100)
            for r in gen_queries(tier).head(60).itertuples(index=False)]
    for name, d in (("full_k100", full_dir), ("appended_k100", app_dir)):
        _res, stats = search(spark, d, k100, "wand", with_stats=True)
        _res.count()
        out[name] = {
            "block_pruning": round(
                1 - stats["blocks_touched"] / stats["blocks_total"], 4
            ),
            "postings_pruning": round(
                1 - stats["postings_touched"] / stats["postings_total"], 4
            ),
        }
    print(json.dumps({"tier": tier, "legs": out}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
