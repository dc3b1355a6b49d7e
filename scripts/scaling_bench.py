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


def run_leg(cores: int, corpus_path: str, tier: str, out_json: str,
            shared_idx: str | None = None) -> None:
    """One measured leg: fresh build + query sweep at local[cores]; with
    ``shared_idx``, skip the build and sweep queries over the prebuilt
    index (query-only scaling — the query path touches ~2% of postings
    under block-max pruning, so unlike the memory-streaming build it is
    not bandwidth-bound on this box)."""
    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    spark = get_spark(app_name=f"eh-scaling-{cores}", cores=cores)
    n_turns = spark.read.parquet(corpus_path).count()
    if shared_idx is not None:
        idx_dir = shared_idx
        build_wall = None
        # 8 seed-distinct query sets (one Spark job): enough kernel work to
        # amortize the per-job fixed costs (dictionary point-read, plan
        # compile, worker startup) that otherwise floor the small-leg wall
        # and masquerade as poor scaling
        import pandas as pd

        qpd = pd.concat(
            [
                gen_queries(tier, seed=s).assign(qid=lambda d, s=s: d.qid + s * 1_000_000)
                for s in range(8)
            ],
            ignore_index=True,
        )
        qdf = spark.createDataFrame(qpd)
    else:
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
    # untimed warmup: in query-only mode the first leg would otherwise read
    # the postings parquet cold while the second leg rides its page cache —
    # a bias toward whichever leg runs later
    search(spark, idx_dir, qdf, "wand").count()
    t0 = time.time()
    search(spark, idx_dir, qdf, "wand").count()
    query_wall = time.time() - t0
    with open(out_json, "w") as f:
        json.dump(
            {
                "turns": n_turns,
                "build_wall_sec": round(build_wall, 2) if build_wall else None,
                "turns_per_sec": round(n_turns / build_wall, 1) if build_wall else None,
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
        shared_idx = sys.argv[6] if len(sys.argv) > 6 else None
        run_leg(cores, corpus_path, tier, out_json, shared_idx)
        return

    argv = sys.argv[1:]
    queries_only = "--queries-only" in argv
    record_label = None
    if "--record" in argv:
        # official sample: append to the committed SCALING.json ledger
        # (bench.py embeds the ledger's medians into its driver-visible JSON)
        i = argv.index("--record")
        record_label = argv[i + 1] if i + 1 < len(argv) else "sample"
        # drop exactly the flag and its value (positional, not by value — a
        # label that collides with the tier name or a core count must not
        # strip the benchmarked configuration)
        del argv[i:i + 2 if i + 1 < len(argv) else i + 1]
    args = [a for a in argv if a != "--queries-only"]
    tier = args[0] if args else "scale"
    global CORES
    if len(args) > 1:
        lo_s, hi_s = args[1].split(",")
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

    shared_idx = None
    if queries_only:
        # build the shared index once at full width (cost excluded); both
        # legs then sweep the SAME index — isolates query-path scaling
        from elastichash_spark.build import IndexConfig, build_index
        from elastichash_spark.session import get_spark

        shared_idx = os.path.join(work, "index_shared")
        spark = get_spark(app_name="eh-scaling-prep", cores=os.cpu_count() or 32)
        build_index(
            spark, corpus_path, shared_idx,
            IndexConfig(num_shards=32, salt_buckets=4, doc_order="doclen"),
            resume=True,
        )
        spark.stop()

    _load_pre = round(os.getloadavg()[0], 2)  # host state before the legs
    have_taskset = shutil.which("taskset") is not None
    results: dict[str, dict] = {}
    for cores in CORES:
        out_json = os.path.join(work, f"leg_{cores}.json")
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--leg", str(cores), corpus_path, tier, out_json,
        ]
        if shared_idx is not None:
            cmd.append(shared_idx)
        if have_taskset:
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        subprocess.run(cmd, check=True)
        with open(out_json) as f:
            results[str(cores)] = json.load(f)

    lo, hi = str(CORES[0]), str(CORES[1])
    n_turns = results[lo].pop("turns")
    results[hi].pop("turns")
    q_speedup = results[hi]["queries_per_sec"] / results[lo]["queries_per_sec"]
    out = {
        "tier": tier,
        "turns": n_turns,
        "cpu_pinning": "taskset" if have_taskset else "none",
        "per_cores": results,
        "query_speedup": round(q_speedup, 3),
        "query_scaling_efficiency": round(q_speedup / (CORES[1] / CORES[0]), 3),
        "criterion": "eff = (thr_4N/thr_N)/(4N/N), target >= 0.8",
    }
    if not queries_only:
        speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
        out["build_speedup"] = round(speedup, 3)
        out["scaling_efficiency"] = round(speedup / (CORES[1] / CORES[0]), 3)
    print(json.dumps(out))

    if record_label is not None and not queries_only:
        ledger_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.json")
        with open(ledger_path) as f:
            ledger = json.load(f)
        # host state alongside the sample (VERDICT r04 next-round #8): the
        # degraded-host day showed load context is needed to read outliers
        ledger["samples"].append({
            "label": record_label,
            "thr_lo": round(results[lo]["turns_per_sec"]),
            "thr_hi": round(results[hi]["turns_per_sec"]),
            "build_eff": out["scaling_efficiency"],
            "query_eff": out["query_scaling_efficiency"],
            "host_load_1m_pre": _load_pre,
            "host_load_1m_post": round(os.getloadavg()[0], 2),
        })
        with open(ledger_path, "w") as f:
            json.dump(ledger, f, indent=2)
        print(f"recorded '{record_label}' in SCALING.json "
              f"({len(ledger['samples'])} samples)", file=sys.stderr)


if __name__ == "__main__":
    main()
