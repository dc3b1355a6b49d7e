"""Corpus-size linearity benchmark: the same build + query jobs over four
corpora spanning 64x in size (bench ~420k turns -> scale ~1.68M -> xl ~6.7M
-> xxl ~26.9M).

This is the measured leg of the 10^12-turn extrapolation argument
(BASELINE.json north_star): at fixed parallelism the build is one linear
pass over the corpus — map-side tokenize+encode, one salted shuffle of
compressed run blobs, one decode-merge-encode pass — so build throughput in
turns/sec should hold ~flat as the corpus grows; a throughput that decayed
with corpus size would compound into a wall at 10^12 turns no matter how
many executors the cluster adds. The WAND query sweep should grow
SUBLINEARLY in corpus size: posting lists lengthen ~linearly with the
corpus, but block-max pruning bounds the touched blocks per query, so the
per-query decode work grows with the touched fraction, not the corpus.

Each tier runs in-process sequentially (small -> large, one SparkSession
per tier so no page-cache or JVM-JIT carryover biases a later tier): gen
corpus -> one fresh build (timed; the xl build is minutes, so one sample —
cross-checked against bench.py's medianed walls at the bench tier) ->
warmup sweep -> median-of-3 WAND and exact sweeps.

Prints one JSON line:
  {"tiers": {name: {turns, build_wall_sec, turns_per_sec, wand_wall_sec,
                    exact_wall_sec, per_query_ms, shards}},
   "throughput_ratio_xl_vs_bench": r_build,
   "query_growth_xl_vs_bench": r_query_wall_vs_16x}

Usage: python scripts/linearity_bench.py [tier ...]   (default: bench scale xl)
       (xxl adds ~25 min of wall: pass it explicitly when extending the span)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# shard count tracks corpus size (>= ~50k docs/shard, bench.py rationale):
# thin shards starve per-shard pruning and multiply WAND per-shard setup.
SHARDS = {"bench": 8, "scale": 16, "xl": 32, "xxl": 64}
_SWEEP_REPS = 3


def run_tier(tier: str, cores: int) -> dict:
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    spark = get_spark(app_name=f"eh-linearity-{tier}", cores=cores)
    work = f"/tmp/eh_linearity_{tier}"
    os.makedirs(work, exist_ok=True)
    corpus_path = os.path.join(work, "transcripts.parquet")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
    n_turns = spark.read.parquet(corpus_path).count()

    idx_dir = os.path.join(work, "index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark, corpus_path, idx_dir,
        IndexConfig(num_shards=SHARDS.get(tier, 32), salt_buckets=4,
                    doc_order="doclen"),
        resume=False,
    )
    build_wall = time.time() - t0

    qdf = spark.createDataFrame(gen_queries(tier))
    n_q = qdf.count()
    search(spark, idx_dir, qdf, "exact").count()  # untimed warmup
    walls: dict[str, list[float]] = {"wand": [], "exact": []}
    for _rep in range(_SWEEP_REPS):
        for strat in ("wand", "exact"):
            t0 = time.time()
            search(spark, idx_dir, qdf, strat).count()
            walls[strat].append(time.time() - t0)
    wand_wall = statistics.median(walls["wand"])
    exact_wall = statistics.median(walls["exact"])
    spark.stop()
    return {
        "turns": n_turns,
        "shards": SHARDS.get(tier, 32),
        "build_wall_sec": round(build_wall, 2),
        "turns_per_sec": round(n_turns / build_wall, 1),
        "wand_wall_sec": round(wand_wall, 2),
        "exact_wall_sec": round(exact_wall, 2),
        "per_query_ms": round(wand_wall / n_q * 1000, 2),
    }


def main() -> None:
    tiers = sys.argv[1:] or ["bench", "scale", "xl"]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {"cores": cores, "tiers": {}}
    for tier in tiers:
        out["tiers"][tier] = run_tier(tier, cores)
    t = out["tiers"]
    if len(t) >= 2:
        # headline ratios span the smallest -> largest tier actually run
        names = sorted(t, key=lambda n: t[n]["turns"])
        lo, hi = names[0], names[-1]
        out["span"] = f"{lo}->{hi}"
        out["corpus_growth"] = round(t[hi]["turns"] / t[lo]["turns"], 1)
        # flat == 1.0; <1 means throughput decayed with corpus size
        out["throughput_ratio"] = round(
            t[hi]["turns_per_sec"] / t[lo]["turns_per_sec"], 3)
        # sublinear iff query wall grew by less than the corpus did
        out["query_growth"] = round(
            t[hi]["wand_wall_sec"] / t[lo]["wand_wall_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
