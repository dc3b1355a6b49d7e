"""Per-query latency benchmark — the analogue of the reference's
``experiments/get_times.py`` + ``get_mtimes.py`` (10k queries swept over
k values, caches cleared between queries, mean/sigma per (method, k)).

Latency is measured at the retrieval-KERNEL level: the per-shard two-stage
kernel vs the decode-everything kernel over the same posting blocks, matching
what the reference times (ES's `took` is engine time inside the server, not
client round-trip). A per-query Spark JOB adds a constant ~850 ms of
scheduling that swamps both methods equally and measures the batch harness,
not the engine.

Two legs per method:
- **cold**: fresh decode caches per query — the single-ad-hoc-query regime,
  directly comparable to the reference's per-request `took` citation
- **warm**: shard-shared caches across the sweep — the engine's
  batch-amortization regime (decode paid once per (shard, term))

Usage: python scripts/latency_bench.py [tier] [n_queries]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kernel_latency(spark, idx_dir: str, queries: list, legs=("cold", "warm")) -> dict:
    """Per-query retrieval-kernel wall times over a prebuilt index, per
    (strategy, leg, k): strategy in (wand, exact), leg 'cold' = fresh decode
    caches per query (the per-request regime comparable to the reference's
    engine `took`), 'warm' = shard-shared caches across the sweep (the batch
    amortization regime). Returns {"<strategy>_<leg>": {k: stats}}.
    Also used by bench.py to report a run-stable two-stage-vs-exact ratio
    (batch sweep walls at local[32] are fixed-cost-dominated and noisy)."""
    import numpy as np
    from pyspark.sql import functions as F

    from elastichash_spark.build import load_index
    from elastichash_spark.query import (
        _BlockTerm,
        _bmw_shard,
        _exact_shard,
        plan_queries,
    )

    meta, _docs, terms_df, postings = load_index(spark, idx_dir)
    if meta.get("appended"):
        # appended indexes must query under drift-safe (max_tf, min_dl)
        # bounds (query.py safe_bounds); this harness reads the stored
        # max_impact directly, which is stale after an append — pruning
        # would be silently unsafe. Refuse rather than mis-measure.
        raise ValueError(
            "kernel_latency does not support appended indexes; use "
            "query.search(with_stats=True) (scripts/append_bench.py)"
        )
    avgdl = float(meta["avgdl"])
    qinfo, needed = plan_queries(terms_df, queries)
    rows = (
        postings.where(F.col("termID").isin([int(t) for t in needed]))
        .select("shard", "termID", "first_docID", "last_docID", "n",
                "max_impact", "blob", "block_id")
        .collect()
    )
    by_shard: dict[int, dict[int, list]] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["termID"], r["block_id"])):
        by_shard.setdefault(r["shard"], {}).setdefault(r["termID"], []).append(r)

    def term_args(sh_terms, term_id, idf):
        blocks = sh_terms.get(term_id)
        if not blocks:
            return None
        return (
            term_id, idf,
            np.array([b["first_docID"] for b in blocks]),
            np.array([b["last_docID"] for b in blocks]),
            np.array([b["n"] for b in blocks]),
            np.array([b["max_impact"] for b in blocks]),
            [bytes(b["blob"]) for b in blocks],
        )

    # Per (query, shard) work is timed individually: the engine executes
    # shards as PARALLEL tasks (query.py repartitions by shard), so the
    # faithful per-request latency model is the MAX over shards (+ the tiny
    # global merge); the SUM is the single-core total-work number. Both are
    # reported — summing would bill WAND for per-shard constant costs 32×
    # serially, an execution the engine never performs.
    out: dict[str, dict] = {}
    for leg in legs:
        warm_caches = {sh: {} for sh in by_shard}
        for strategy in ("wand", "exact"):
            per_k_sum: dict[int, list[float]] = {}
            per_k_max: dict[int, list[float]] = {}
            for q in qinfo:
                caches = (
                    {sh: {} for sh in by_shard} if leg == "cold" else warm_caches
                )
                shard_ms = []
                for sh, sh_terms in by_shard.items():
                    args = [a for tid, idf, _b in q["terms"] if (a := term_args(sh_terms, tid, idf))]
                    if not args:
                        continue
                    t0 = time.perf_counter()
                    bts = [_BlockTerm(*a, avgdl=avgdl, cache=caches[sh]) for a in args]
                    if strategy == "wand":
                        _bmw_shard(bts, q["k"])
                    else:
                        _exact_shard(bts, q["k"])
                    shard_ms.append((time.perf_counter() - t0) * 1000.0)
                per_k_sum.setdefault(q["k"], []).append(sum(shard_ms))
                per_k_max.setdefault(q["k"], []).append(max(shard_ms) if shard_ms else 0.0)
            def _pct(vals, p):
                # nearest-rank percentile over the per-query walls
                s = sorted(vals)
                return round(s[min(len(s) - 1, int(round(p / 100 * len(s) + 0.5)) - 1)], 2)

            out[f"{strategy}_{leg}"] = {
                str(k): {
                    "mean_ms": round(statistics.mean(v), 2),
                    "sigma_ms": round(statistics.pstdev(v), 2),
                    "p50_ms": _pct(v, 50),
                    "p99_ms": _pct(v, 99),
                    "parallel_mean_ms": round(statistics.mean(per_k_max[k]), 2),
                    "parallel_p50_ms": _pct(per_k_max[k], 50),
                    "parallel_p99_ms": _pct(per_k_max[k], 99),
                    "n": len(v),
                }
                for k, v in sorted(per_k_sum.items())
            }
    return out


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.session import get_spark

    spark = get_spark(app_name="eh-latency")
    work = f"/tmp/eh_latency_{tier}_v2"
    corpus_path = os.path.join(work, "transcripts.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        os.makedirs(work, exist_ok=True)
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
    idx_dir = os.path.join(work, "index")
    build_index(
        spark, corpus_path, idx_dir,
        IndexConfig(num_shards=8, salt_buckets=4, doc_order="doclen"),
    )

    queries = [
        (int(r.qid), r.text, int(r.k))
        for r in gen_queries(tier).head(n_queries).itertuples(index=False)
    ]
    out = kernel_latency(spark, idx_dir, queries, legs=("cold", "warm"))
    ratios = {
        leg: {
            k: round(out[f"exact_{leg}"][k]["mean_ms"] / out[f"wand_{leg}"][k]["mean_ms"], 2)
            for k in out[f"wand_{leg}"]
        }
        for leg in ("cold", "warm")
    }
    print(
        json.dumps(
            {
                "tier": tier,
                "n_queries": n_queries,
                "per_method_k": out,
                "exact_over_wand_ratio": ratios,
                # comparable axis: the COLD leg (per-request, no shared
                # caches) vs the reference's per-request engine time
                "reference": "two-stage 36.12ms vs exact 111.83ms at k=10 (slides p.16); compare the cold leg",
            }
        )
    )


if __name__ == "__main__":
    main()
