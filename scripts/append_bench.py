"""Post-append pruning economics — how much of the block-max pruning
survives N incremental appends.

Appended indexes query under statistics-drift-safe bounds: the stored
``max_impact`` was computed with build-time (idf, avgdl), which every append
changes, so the query kernel rebuilds a safe per-block bound from the
drift-free (max_tf, min_dl) block stats under CURRENT statistics
(query.py safe_bounds path). tf_part(max_tf, min_dl) >= tf_part of any
member posting, but it is looser than the exact per-block impact maximum —
this script measures the price.

Legs over the SAME corpus and query set (bench tier by default):
- ``full``: one-shot build of the whole corpus (exact max_impact bounds)
- ``appended``: build 60%, then append two 20% batches (safe bounds)
- ``refreshed``: the appended index after ``refresh_bounds`` — exact
  per-block maxima recomputed under merged stats (measured: near-zero
  delta; the post-append gap is STRUCTURAL shard fragmentation, not
  bound looseness)
- ``compacted``: after ``compact_index`` — append generations folded into
  the base shard layout; pruning should land within ~1 point of ``full``
- ``*_k100``: the same states at k=100 (deep-k)

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

    from elastichash_spark.append import (append_index, compact_index,
                                          refresh_bounds)
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

    def leg(name: str, d: str, timed: bool = True) -> None:
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

    def leg_k100(name: str, d: str) -> None:
        k100 = [(int(r.qid), r.text, 100)
                for r in gen_queries(tier).head(60).itertuples(index=False)]
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

    leg("full", full_dir)
    leg("appended", app_dir)
    leg_k100("full_k100", full_dir)
    leg_k100("appended_k100", app_dir)
    # bounds-only refresh: exact per-block maxima recomputed under merged
    # stats (measured: near-zero pruning delta — the gap is structural)
    t0 = time.time()
    refreshed = refresh_bounds(spark, app_dir)
    out["refresh_op"] = {"wall_s": round(time.time() - t0, 2),
                         "blocks": refreshed["blocks"]}
    leg("refreshed", app_dir)
    leg_k100("refreshed_k100", app_dir)
    # full merge compaction: fold append generations into the base shard
    # layout; pruning should land within ~1 point of the fresh full build
    t0 = time.time()
    compacted = compact_index(spark, app_dir)
    out["compact_op"] = {"wall_s": round(time.time() - t0, 2),
                         "blocks": compacted["blocks"]}
    leg("compacted", app_dir)
    leg_k100("compacted_k100", app_dir)
    print(json.dumps({"tier": tier, "legs": out}))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
