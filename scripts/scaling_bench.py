"""Scaling-efficiency benchmark: the same index-build job at two parallelism
levels (local[8] vs local[32]) on the same input — the sandbox stand-in for
the north rule's N vs 4N executor criterion (BASELINE.md).

Prints one JSON line:
  {"throughput_8": t/s, "throughput_32": t/s, "scaling_efficiency": eff, ...}
with eff = (thr_32 / thr_8) / (32/8); target >= 0.8.

Usage: python scripts/scaling_bench.py [tier] [--queries]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = (8, 32)


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    work = f"/tmp/eh_scaling_{tier}"
    os.makedirs(work, exist_ok=True)
    corpus_path = os.path.join(work, "transcripts.parquet")

    # generate the shared input once (its cost is excluded from the measurement)
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        spark = get_spark(app_name="eh-scaling-gen", cores=32)
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    results: dict[str, dict] = {}
    n_turns = None
    for cores in CORES:
        spark = get_spark(app_name=f"eh-scaling-{cores}", cores=cores)
        if n_turns is None:
            n_turns = spark.read.parquet(corpus_path).count()
        idx_dir = os.path.join(work, f"index_{cores}")
        shutil.rmtree(idx_dir, ignore_errors=True)
        t0 = time.time()
        build_index(
            spark, corpus_path, idx_dir,
            IndexConfig(num_shards=32, salt_buckets=4), resume=False,
        )
        build_wall = time.time() - t0
        qdf = spark.createDataFrame(gen_queries(tier))
        t0 = time.time()
        n_q = qdf.count()
        search(spark, idx_dir, qdf, "wand").count()
        query_wall = time.time() - t0
        results[str(cores)] = {
            "build_wall_sec": round(build_wall, 2),
            "turns_per_sec": round(n_turns / build_wall, 1),
            "query_wall_sec": round(query_wall, 2),
            "queries_per_sec": round(n_q / query_wall, 1),
        }
        spark.stop()

    lo, hi = str(CORES[0]), str(CORES[1])
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    eff = speedup / (CORES[1] / CORES[0])
    q_speedup = results[hi]["queries_per_sec"] / results[lo]["queries_per_sec"]
    print(
        json.dumps(
            {
                "tier": tier,
                "turns": n_turns,
                "per_cores": results,
                "build_speedup": round(speedup, 3),
                "scaling_efficiency": round(eff, 3),
                "query_speedup": round(q_speedup, 3),
                "criterion": "eff = (thr_32/thr_8)/(32/8), target >= 0.8",
            }
        )
    )


if __name__ == "__main__":
    main()
