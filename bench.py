"""Headline benchmark — prints ONE JSON line.

Measures the engine's two headline metrics (BASELINE.json):
- index-build throughput in turns/sec over the deterministic transcript
  corpus (tier scaled to $SPARK_GRAFT_SF_DIR), built fresh (no resume reuse)
- query latency: block-max WAND (two-stage) vs exact decode-everything over
  the same index — the economics the reference demonstrates in
  slides p.16 (two-stage 36ms vs exact 112ms)
plus the operator suite's heavier entries over the testdata tables.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py and recorded in BENCH.md — this script measures at
the driver-provided core count only.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TIER_BY_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}


def main() -> None:
    from elastichash_spark import suite
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    tier = TIER_BY_SF.get(os.path.basename(os.path.normpath(SF_DIR)), "bench")
    spark = get_spark(app_name="elastichash-bench", cores=CPUS)
    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    work = os.path.join("/tmp", f"eh_bench_{tier}_{CPUS}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    corpus_path = os.path.join(work, "transcripts.parquet")

    def gen():
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
        return spark.read.parquet(corpus_path).count()

    n_turns = timed("gen_corpus", gen)

    idx_dir = os.path.join(work, "index")
    timed(
        "index_build",
        lambda: build_index(
            spark, corpus_path, idx_dir,
            # impact-aware docID order: the production config — block-max
            # pruning needs the doclen-clustered assignment (BENCH.md).
            # Shard count tracks corpus size (>= ~50k docs/shard), NOT core
            # count: build parallelism comes from the 4x-width run/merge
            # repartitions, while thin shards starve per-shard pruning (the
            # local top-k threshold needs a deep local corpus) and multiply
            # WAND's per-shard setup cost. The reference runs 3 shards for
            # 7M docs (import_csv.py:31).
            IndexConfig(num_shards=8, salt_buckets=4, doc_order="doclen"),
            resume=False,
        ),
    )
    turns_per_sec = n_turns / timings["index_build"]

    qdf = spark.createDataFrame(gen_queries(tier))
    # untimed warmup: first touch of the postings parquet (page cache,
    # footers, worker JIT) would otherwise bias whichever strategy runs
    # first; both timed legs below run warm
    search(spark, idx_dir, qdf, "exact").count()
    n_res_wand = timed("query_wand", lambda: search(spark, idx_dir, qdf, "wand").count())
    n_res_exact = timed("query_exact", lambda: search(spark, idx_dir, qdf, "exact").count())
    # measured two-stage economics (separate passes so the timed legs above
    # stay pure): block pruning rate over the full query sweep + a
    # kernel-level cold-cache latency sample. The batch sweep walls above are
    # fixed-cost-dominated at local[32] (scan + shuffle + window ≈ both
    # strategies), so the run-stable economics numbers are these two.
    res_s, wand_stats = search(spark, idx_dir, qdf, "wand", with_stats=True)
    res_s.count()
    pruning_rate = (
        1.0 - wand_stats["blocks_touched"] / wand_stats["blocks_total"]
        if wand_stats["blocks_total"] else 0.0
    )
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from latency_bench import kernel_latency

    qk10 = [(int(r.qid), r.text, 10) for r in gen_queries(tier).head(30).itertuples(index=False)]
    lat = kernel_latency(spark, idx_dir, qk10, legs=("cold",))
    # parallel model: shards execute as concurrent tasks, latency = max shard
    cold_wand = lat["wand_cold"]["10"]["parallel_mean_ms"]
    cold_exact = lat["exact_cold"]["10"]["parallel_mean_ms"]

    # operator suite heavy hitters over the driver-provided sf tables
    timed("bm25_twostage_docs", lambda: suite.q_bm25_twostage(spark, SF_DIR).count())
    timed("minhash_lsh_pairs", lambda: suite.q_lsh_pairs(spark, SF_DIR).count())
    timed("jaccard_pairs", lambda: suite.q_jaccard_pairs(spark, SF_DIR).count())
    timed("simhash", lambda: suite.q_simhash(spark, SF_DIR).count())
    timed("embedding_topk", lambda: suite.q_embedding_topk(spark, SF_DIR).count())
    timed("pricing_summary", lambda: suite.q_pricing_summary(spark, SF_DIR).count())
    timed("hamming_twostage", lambda: suite.q_hamming_twostage(spark, SF_DIR).count())
    timed("embedding_neardup", lambda: suite.q_embedding_neardup(spark, SF_DIR).count())
    timed("sessionize", lambda: suite.q_sessionize(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "engine suite wall time (build+query+operators)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cores": CPUS,
                "tier": tier,
                "turns": n_turns,
                "index_build_turns_per_sec": round(turns_per_sec, 1),
                "wand_result_rows": n_res_wand,
                "exact_result_rows": n_res_exact,
                "wand_blocks_total": wand_stats["blocks_total"],
                "wand_blocks_touched": wand_stats["blocks_touched"],
                "wand_block_pruning_rate": round(pruning_rate, 4),
                "kernel_cold_ms_k10": {"wand": cold_wand, "exact": cold_exact},
                "wand_vs_exact_kernel_cold_speedup": round(cold_exact / cold_wand, 2),
                "wand_vs_exact_batch_wall": round(
                    timings["query_exact"] / timings["query_wand"], 2
                ),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
