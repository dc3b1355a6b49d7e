"""Scaling-efficiency benchmark: the same index-build job at two parallelism
levels (local[8] vs local[32]) on the same input — the sandbox stand-in for
the north rule's N vs 4N executor criterion (BASELINE.md).

Each leg runs as its own subprocess pinned to exactly N physical cores with
``taskset`` (when available). Without pinning, the local[8] leg free-rides on
the machine's other 24 cores — JVM GC/shuffle/IO threads and Python UDF
workers are not bounded by task slots — which systematically deflates the
measured efficiency vs what a real 8-executor cluster would show.

Prints one JSON line:
  {"per_cores": {...}, "build_speedup": x, "scaling_efficiency": eff, ...}
with eff = (thr_32 / thr_8) / (32/8); target >= 0.8.

Usage: python scripts/scaling_bench.py [tier] [N,4N]   (default: scale 8,32)
       python scripts/scaling_bench.py --leg N corpus_path out_json  (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = (8, 32)


def run_leg(cores: int, corpus_path: str, tier: str, out_json: str) -> None:
    """One measured leg: fresh build + query sweep at local[cores]."""
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    spark = get_spark(app_name=f"eh-scaling-{cores}", cores=cores)
    n_turns = spark.read.parquet(corpus_path).count()
    idx_dir = os.path.join(os.path.dirname(corpus_path), f"index_{cores}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    build_index(
        spark, corpus_path, idx_dir,
        IndexConfig(num_shards=32, salt_buckets=4, doc_order="doclen"),
        resume=False,
    )
    build_wall = time.time() - t0
    qdf = spark.createDataFrame(gen_queries(tier))
    n_q = qdf.count()
    t0 = time.time()
    search(spark, idx_dir, qdf, "wand").count()
    query_wall = time.time() - t0
    with open(out_json, "w") as f:
        json.dump(
            {
                "turns": n_turns,
                "build_wall_sec": round(build_wall, 2),
                "turns_per_sec": round(n_turns / build_wall, 1),
                "query_wall_sec": round(query_wall, 2),
                "queries_per_sec": round(n_q / query_wall, 1),
            },
            f,
        )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        cores, corpus_path, tier, out_json = (
            int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
        )
        run_leg(cores, corpus_path, tier, out_json)
        return

    tier = sys.argv[1] if len(sys.argv) > 1 else "scale"
    global CORES
    if len(sys.argv) > 2:
        lo_s, hi_s = sys.argv[2].split(",")
        CORES = (int(lo_s), int(hi_s))
    work = f"/tmp/eh_scaling_{tier}"
    os.makedirs(work, exist_ok=True)
    corpus_path = os.path.join(work, "transcripts.parquet")

    # generate the shared input once (cost excluded from the measurement)
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from elastichash_spark.fixtures import gen_transcripts_spark
        from elastichash_spark.session import get_spark

        spark = get_spark(app_name="eh-scaling-gen", cores=os.cpu_count() or 32)
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    have_taskset = shutil.which("taskset") is not None
    results: dict[str, dict] = {}
    for cores in CORES:
        out_json = os.path.join(work, f"leg_{cores}.json")
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--leg", str(cores), corpus_path, tier, out_json,
        ]
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        subprocess.run(cmd, check=True)
        with open(out_json) as f:
            results[str(cores)] = json.load(f)

    lo, hi = str(CORES[0]), str(CORES[1])
    n_turns = results[lo].pop("turns")
    results[hi].pop("turns")
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    eff = speedup / (CORES[1] / CORES[0])
    q_speedup = results[hi]["queries_per_sec"] / results[lo]["queries_per_sec"]
    print(
        json.dumps(
            {
                "tier": tier,
                "turns": n_turns,
                "cpu_pinning": "taskset" if have_taskset else "none",
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
