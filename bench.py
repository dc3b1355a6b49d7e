"""Headline benchmark — prints ONE JSON line.

Measures the engine's two headline metrics (BASELINE.json):
- index-build throughput in turns/sec over the deterministic transcript
  corpus (tier scaled to $SPARK_GRAFT_SF_DIR), built fresh (no resume reuse)
- query latency: block-max WAND (two-stage) vs exact decode-everything over
  the same index — the economics the reference demonstrates in
  slides p.16 (two-stage 36ms vs exact 112ms)
plus the operator suite's heavier entries over the testdata tables.

Two-stage-vs-exact economics are reported on THREE explicitly-named axes
(they answer different questions and must not be conflated):
- ``totalwork``: per-query cold kernel wall summed over shards — the
  single-core total work a request costs the cluster. Median over
  ``_KERNEL_REPS`` repetitions of the 60-query mean (shared-VM walls swing
  ±15-50%; medians of means are run-stable).
- ``parallel``: per-query cold kernel wall as max over shards — the
  per-request latency when shards execute as concurrent tasks (the plan
  the engine actually runs).
- ``batch wall``: end-to-end 500-query sweep through Spark. At the bench
  tier this is fixed-cost-dominated (scan + shuffle + window ≈ both
  strategies); the SCALE tier (1.68M turns) makes decode work dominate, so
  the scale batch wall is the driver-visible end-to-end demonstration.

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
scripts/scaling_bench.py and recorded in BENCH.md — this script measures at
the driver-provided core count only.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TIER_BY_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench"}
_KERNEL_REPS = 5
_STAGE_REPS = 3  # headline stage walls are medians too (shared-VM variance)


def _scaling_evidence() -> dict | None:
    """North-rule scaling evidence (efficiency >= 0.8 moving N -> 4N),
    from the committed SCALING.json ledger of official taskset-pinned
    `scripts/scaling_bench.py` samples. Embedded here so the driver's
    BENCH artifact carries the criterion directly; this run itself
    measures only at the driver-provided core count."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    try:
        with open(path) as f:
            ledger = json.load(f)
        samples = ledger["samples"]
        return {
            "pair_cores": ledger["pair"],
            "n_samples": len(samples),
            "median_build_efficiency": round(
                statistics.median(s["build_eff"] for s in samples), 3),
            "median_query_efficiency": round(
                statistics.median(s["query_eff"] for s in samples), 3),
            "best_build_efficiency": max(s["build_eff"] for s in samples),
            "latest_sample": samples[-1],
            "criterion": ledger["criterion"],
            "methodology": "scripts/scaling_bench.py, taskset-pinned legs; per-sample detail in BENCH.md",
        }
    except (OSError, KeyError, ValueError):
        return None


def main() -> None:
    from elastichash_spark import suite
    from elastichash_spark.build import IndexConfig, build_index, index_format_tag
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.operators.aggs import facet_counts
    from elastichash_spark.query import search, search_mining
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
    # median of _STAGE_REPS fresh builds: single stage walls on this shared
    # VM swing far beyond the ±15% once claimed (BENCH_r03's index_build
    # came in 30% under r02 with IDENTICAL code — uniform across unrelated
    # entries, i.e. host contention). The kernel numbers already median;
    # the headline stage walls now do too.
    build_walls: list[float] = []
    for _rep in range(_STAGE_REPS):
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
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
        )
        build_walls.append(time.time() - t0)
    timings["index_build"] = round(statistics.median(build_walls), 3)
    turns_per_sec = n_turns / timings["index_build"]

    qdf = spark.createDataFrame(gen_queries(tier))
    # untimed warmup: first touch of the postings parquet (page cache,
    # footers, worker JIT) would otherwise bias whichever strategy runs
    # first; both timed legs below run warm
    search(spark, idx_dir, qdf, "exact").count()
    # alternate strategies, median of _STAGE_REPS — same variance control
    qwalls: dict[str, list[float]] = {"wand": [], "exact": []}
    n_res_wand = n_res_exact = 0
    for _rep in range(_STAGE_REPS):
        for strat in ("wand", "exact"):
            t0 = time.time()
            n = search(spark, idx_dir, qdf, strat).count()
            qwalls[strat].append(time.time() - t0)
            if strat == "wand":
                n_res_wand = n
            else:
                n_res_exact = n
    timings["query_wand"] = round(statistics.median(qwalls["wand"]), 3)
    timings["query_exact"] = round(statistics.median(qwalls["exact"]), 3)
    # measured two-stage economics (separate passes so the timed legs above
    # stay pure): block/posting pruning rates over the full query sweep + the
    # variance-controlled kernel-level cold model at k=10 and k=100
    res_s, wand_stats = search(spark, idx_dir, qdf, "wand", with_stats=True)
    res_s.count()
    pruning_rate = (
        1.0 - wand_stats["blocks_touched"] / wand_stats["blocks_total"]
        if wand_stats["blocks_total"] else 0.0
    )
    postings_rate = (
        1.0 - wand_stats["postings_touched"] / wand_stats["postings_total"]
        if wand_stats["postings_total"] else 0.0
    )
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from latency_bench import kernel_latency

    base_q = gen_queries(tier).head(30)
    kernel: dict[str, dict] = {}
    for k in (10, 100):
        qk = [(int(r.qid), r.text, k) for r in base_q.itertuples(index=False)]
        per_axis: dict[str, list[float]] = {}
        for _rep in range(_KERNEL_REPS):
            lat = kernel_latency(spark, idx_dir, qk, legs=("cold",))
            for strat in ("wand", "exact"):
                st = lat[f"{strat}_cold"][str(k)]
                per_axis.setdefault(f"{strat}_totalwork", []).append(st["mean_ms"])
                per_axis.setdefault(f"{strat}_parallel", []).append(
                    st["parallel_mean_ms"]
                )
        med = {ax: round(statistics.median(v), 2) for ax, v in per_axis.items()}
        kernel[f"k{k}"] = {
            **med,
            "speedup_totalwork": round(
                med["exact_totalwork"] / med["wand_totalwork"], 2
            ),
            "speedup_parallel": round(
                med["exact_parallel"] / med["wand_parallel"], 2
            ),
        }

    # ---- mining leg: >= 10k queries through the NON-COLLECTED grid path
    # (search_mining) — query-by-every-document economics. Queries derive
    # from the corpus's own turns: two 60-char text windows x 5k turns.
    mq = (
        spark.read.parquet(corpus_path).selectExpr(
            "monotonically_increasing_id() AS qid",
            "substring(text, 1, 60) AS text").limit(5000)
        .unionByName(
            spark.read.parquet(corpus_path).selectExpr(
                "monotonically_increasing_id() + 5000000 AS qid",
                "substring(text, 8, 60) AS text").limit(5000))
    )
    n_mq = mq.count()
    t0 = time.time()
    mining_rows = search_mining(spark, idx_dir, mq, k=10).count()
    timings["mining_batch"] = round(time.time() - t0, 3)
    mining = {
        "queries": n_mq,
        "result_rows": mining_rows,
        "wall_s": timings["mining_batch"],
        "queries_per_sec": round(n_mq / timings["mining_batch"], 1),
    }

    # ---- scale-tier batch leg: end-to-end Spark sweep where decode work
    # dominates the fixed per-job costs. The index is resumable and cached
    # under the format tag (first run builds it, ~2 min; later runs reload).
    scale = {}
    if tier == "bench":
        scfg = IndexConfig(num_shards=32, salt_buckets=4, doc_order="doclen")
        sdir = os.path.join("/tmp", f"eh_bench_scale_{index_format_tag(scfg)[:12]}")
        os.makedirs(sdir, exist_ok=True)
        s_corpus = os.path.join(sdir, "transcripts.parquet")
        if not os.path.exists(os.path.join(s_corpus, "_SUCCESS")):
            gen_transcripts_spark(spark, "scale").write.mode("overwrite").parquet(s_corpus)
        s_turns = spark.read.parquet(s_corpus).count()
        s_idx = os.path.join(sdir, "index")
        timed("scale_index_build_or_resume",
              lambda: build_index(spark, s_corpus, s_idx, scfg, resume=True))
        s_q = spark.createDataFrame(gen_queries("scale"))
        search(spark, s_idx, s_q, "exact").count()  # warmup (page cache, JIT)
        # alternate strategies, median of 3 — single batch walls on this
        # shared VM swing +-15% and a one-sample ratio is not publishable
        walls: dict[str, list[float]] = {"wand": [], "exact": []}
        s_wand = 0
        for _rep in range(3):
            for strat in ("wand", "exact"):
                t0 = time.time()
                s_wand = search(spark, s_idx, s_q, strat).count()
                walls[strat].append(time.time() - t0)
        timings["scale_query_wand"] = round(statistics.median(walls["wand"]), 3)
        timings["scale_query_exact"] = round(statistics.median(walls["exact"]), 3)
        _sres, s_stats = search(spark, s_idx, s_q, "wand", with_stats=True)
        _sres.count()
        scale = {
            "turns": s_turns,
            "result_rows": s_wand,
            "batch_wall_wand_s": timings["scale_query_wand"],
            "batch_wall_exact_s": timings["scale_query_exact"],
            "batch_wall_speedup": round(
                timings["scale_query_exact"] / timings["scale_query_wand"], 2
            ),
            "block_pruning_rate": round(
                1.0 - s_stats["blocks_touched"] / s_stats["blocks_total"], 4
            ) if s_stats["blocks_total"] else 0.0,
            "postings_pruning_rate": round(
                1.0 - s_stats["postings_touched"] / s_stats["postings_total"], 4
            ) if s_stats["postings_total"] else 0.0,
        }
        # hot-term aggregation economics at scale: the 'the'-query facet and
        # significant_terms over the FULL match set via the pre-merge
        # candidate stream (raw_matches) — no per-qid top-k window, so the
        # corpus-sized match set never funnels through one task; the facet
        # shuffle is bounded by distinct (qid, role) and the sig-terms
        # shuffle by distinct (qid, term) after map-side partial aggregation.
        from pyspark.sql import functions as SF

        from elastichash_spark.operators.aggs import significant_terms

        t0 = time.time()
        hot = search(spark, s_idx, [(0, "the", 1 << 40)], strategy="exact",
                     raw_matches=True)
        docs_meta = spark.read.parquet(os.path.join(s_idx, "docs")) \
            .select("docID", "role")
        fc = facet_counts(hot, docs_meta, "role", id_col="docID").collect()
        timings["scale_facet_hot"] = round(time.time() - t0, 3)
        scale["facet_hot_the"] = {
            "wall_s": timings["scale_facet_hot"],
            "matches": int(sum(r["n_docs"] for r in fc)),
            "facet_rows": len(fc),
        }
        # doc_terms comes from the index's own postings (one posting per
        # distinct (term, doc) by construction — postings_docids(None)),
        # not a corpus re-tokenize + DISTINCT shuffle; term strings and
        # background df come from the term dictionary. An earlier
        # tokenize-based variant of this leg cost ~45 s; the decode-based
        # one is postings-I/O-bound.
        from elastichash_spark.query import postings_docids

        t0 = time.time()
        doc_terms = postings_docids(spark, s_idx, None) \
            .select("docID", SF.col("termID").alias("term"))
        tdf = spark.read.parquet(os.path.join(s_idx, "terms")) \
            .select(SF.col("termID").alias("term"), "df")
        sig = significant_terms(
            hot.select("qid", "docID"), doc_terms, tdf,
            n_docs=s_turns, id_col="docID",
            # single hot query: the 1M-doc foreground is ~16 MB — broadcast
            # it so the 75M-row incidence side never shuffles (streams
            # map-side into the partial agg)
            broadcast_matches=True,
        ).count()
        timings["scale_sig_terms_hot"] = round(time.time() - t0, 3)
        scale["sig_terms_hot_the"] = {
            "wall_s": timings["scale_sig_terms_hot"], "rows": int(sig)}

        # ---- per-query latency distribution at the SCALE tier (VERDICT
        # r04 next-round #6): cold-cache kernel walls per query — the axis
        # directly comparable to the reference's headline per-request
        # table (36.12 ms two-stage vs 111.83 ms exact at k=10, 7M docs,
        # caches cleared between queries like get_times.py) — at k =
        # 10/100/1000 over 60 queries. totalwork = sum over shards
        # (single-core work), parallel = max over shards (the per-request
        # latency under the engine's actual task fan-out); p50/p99 are
        # nearest-rank over the 60 per-query walls.
        t0 = time.time()
        lat_q = gen_queries("scale").head(60)
        latency_methods: dict[str, dict] = {"wand": {}, "exact": {}}
        # untimed warmup sweep: the first driver-side kernel pass pays
        # one-time costs (page-cache touch of the collected blobs, numpy
        # allocator growth, JVM-side collect warm) that inflated the
        # first k's means 3-8x in testing; every timed sweep below runs
        # warm, like the batch legs
        kernel_latency(
            spark, s_idx,
            [(int(r.qid), r.text, 10) for r in lat_q.itertuples(index=False)],
            legs=("cold",))
        for lk in (10, 100, 1000):
            qk = [(int(r.qid), r.text, lk)
                  for r in lat_q.itertuples(index=False)]
            lat = kernel_latency(spark, s_idx, qk, legs=("cold",))
            for strat in ("wand", "exact"):
                latency_methods[strat][f"k{lk}"] = lat[f"{strat}_cold"][str(lk)]
        timings["scale_latency_sweep"] = round(time.time() - t0, 3)
        latency = {
            "tier": "scale",
            "turns": s_turns,
            "n_queries": len(qk),
            "ks": [10, 100, 1000],
            "per_method_k": latency_methods,
            "ratio_parallel_p50": {
                f"k{lk}": round(
                    latency_methods["exact"][f"k{lk}"]["parallel_p50_ms"]
                    / latency_methods["wand"][f"k{lk}"]["parallel_p50_ms"], 2)
                for lk in (10, 100, 1000)
                if latency_methods["wand"][f"k{lk}"]["parallel_p50_ms"] > 0
            },
            "methodology": (
                "cold leg: fresh decode caches per query (the per-request "
                "regime; reference get_times.py clears caches likewise); "
                "kernel-level walls exclude the ~850 ms/job Spark batch "
                "scheduling constant that swamps both methods equally — "
                "see scripts/latency_bench.py. Reference comparison point: "
                "two-stage 36.12 ms vs exact 111.83 ms at k=10 on 7M docs "
                "(slides p.16); this corpus differs in size and hardware, "
                "so the honest cross-engine axis is the ratio."
            ),
        }
    else:
        latency = {}

    # operator suite heavy hitters over the driver-provided sf tables.
    # "[2x]"-suffixed legs time MERGED variant-tagged suite entries that run
    # BOTH their variants in one call (wand+daat, plain+salted) — roughly
    # double the single-variant work; the suffix keeps the JSON
    # self-explaining across rounds (VERDICT r04 "what's wrong" #2).
    timed("bm25_twostage_docs[2x]",
          lambda: suite.q_bm25_twostage(spark, SF_DIR).count())
    timed("minhash_lsh_pairs", lambda: suite.q_lsh_pairs(spark, SF_DIR).count())
    timed("jaccard_pairs", lambda: suite.q_jaccard_pairs(spark, SF_DIR).count())
    timed("simhash", lambda: suite.q_simhash(spark, SF_DIR).count())
    timed("embedding_topk", lambda: suite.q_embedding_topk(spark, SF_DIR).count())
    timed("pricing_summary", lambda: suite.q_pricing_summary(spark, SF_DIR).count())
    timed("hamming_twostage", lambda: suite.q_hamming_twostage(spark, SF_DIR).count())
    timed("embedding_neardup", lambda: suite.q_embedding_neardup(spark, SF_DIR).count())
    timed("sessionize[2x]", lambda: suite.q_sessionize(spark, SF_DIR).count())

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
                "wand_postings_pruning_rate": round(postings_rate, 4),
                # cold kernel economics, median of _KERNEL_REPS repetitions;
                # totalwork = sum over shards (single-core work), parallel =
                # max over shards (per-request latency under task fan-out)
                "kernel_cold_ms": kernel,
                "kernel_reps": _KERNEL_REPS,
                "wand_vs_exact_kernel_cold_speedup": kernel["k10"]["speedup_totalwork"],
                "wand_vs_exact_batch_wall": round(
                    timings["query_exact"] / timings["query_wand"], 2
                ),
                "stage_reps": _STAGE_REPS,
                "index_build_walls_s": [round(w, 3) for w in build_walls],
                "mining": mining,
                "scale_tier": scale,
                "latency": latency,
                "scaling": _scaling_evidence(),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
