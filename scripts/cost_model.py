"""Measured per-turn cost constants for the 10^12-turn extrapolation.

The linearity bench (scripts/linearity_bench.py) shows build throughput is
~flat and WAND sweep wall ~constant across a 16x corpus span — the SHAPE
needed to extrapolate. This script supplies the CONSTANTS: it runs one
fresh scale-tier build plus one WAND sweep with the Spark UI enabled,
harvests per-stage executor metrics from the REST API (input / output /
shuffle-read / shuffle-write bytes, executor CPU time), measures the
on-disk artifacts, and prints one JSON line of per-turn costs. BENCH.md's
"10^12-turn bill of materials" table is derived from this output — the
goal is that every number in the extrapolation traces to a measured
constant here, not a guess.

Why REST and not a listener: PySpark exposes no shuffle metrics through
py4j short of a custom SparkListener jar; the UI REST API
(/api/v1/applications/<id>/stages) reports the same aggregates with zero
engine changes, and local-mode "executor" metrics are the real task
metrics.

Usage: python scripts/cost_model.py [tier]      (default: scale)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_METRIC_KEYS = (
    "inputBytes", "outputBytes", "shuffleReadBytes", "shuffleWriteBytes",
    "executorRunTime", "executorCpuTime",
)


def _stage_totals(ui_url: str) -> dict[str, int]:
    """Sum task metrics over every completed stage of the one local app."""
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete",
        timeout=30,
    ) as r:
        stages = json.load(r)
    # Spark stage NAMES are call-site anonfuns (useless); job DESCRIPTIONS
    # carry the builder's eh-build:<stage> labels (build.py _desc) — map
    # every stage id to its job's description for attribution
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/jobs", timeout=30
    ) as r:
        jobs = json.load(r)
    desc_of = {}
    for j in jobs:
        d = j.get("description") or ""
        for sid in j.get("stageIds", []):
            desc_of[sid] = d
    out = {k: 0 for k in _METRIC_KEYS}
    for st in stages:
        for k in _METRIC_KEYS:
            out[k] += int(st.get(k, 0))
    out["n_stages"] = len(stages)
    out["stages"] = [
        {
            "id": st["stageId"],
            "desc": desc_of.get(st["stageId"], ""),
            "shuffleWriteBytes": int(st.get("shuffleWriteBytes", 0)),
            "shuffleReadBytes": int(st.get("shuffleReadBytes", 0)),
            "inputBytes": int(st.get("inputBytes", 0)),
            "outputBytes": int(st.get("outputBytes", 0)),
            "executorRunTime": int(st.get("executorRunTime", 0)),
        }
        for st in stages
    ]
    return out


def _delta(after: dict, before: dict) -> dict:
    seen = {st["id"] for st in before.get("stages", [])}
    out = {k: after[k] - before[k] for k in _METRIC_KEYS}
    out["n_stages"] = after["n_stages"] - before["n_stages"]
    new_stages = [st for st in after["stages"] if st["id"] not in seen]
    # aggregate the delta per job description (eh-build:docs / mruns / ...)
    per_desc: dict[str, dict[str, int]] = {}
    for st in new_stages:
        d = st["desc"] or "(unlabeled)"
        agg = per_desc.setdefault(d, {
            "shuffleWriteBytes": 0, "shuffleReadBytes": 0, "inputBytes": 0,
            "outputBytes": 0, "executorRunTime": 0, "n_stages": 0,
        })
        for k in ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes",
                  "outputBytes", "executorRunTime"):
            agg[k] += st[k]
        agg["n_stages"] += 1
    out["per_stage_attribution"] = per_desc
    return out


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    tier = sys.argv[1] if len(sys.argv) > 1 else "scale"

    from elastichash_spark.build import IndexConfig, build_index
    from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
    from elastichash_spark.query import search
    from elastichash_spark.session import get_spark

    spark = get_spark(
        app_name="eh-costmodel",
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui_url = spark.sparkContext.uiWebUrl
    if not ui_url:
        raise RuntimeError("Spark UI did not come up — cannot harvest metrics")

    work = "/tmp/eh_costmodel"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    corpus = os.path.join(work, "transcripts.parquet")
    gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus)
    n_turns = spark.read.parquet(corpus).count()
    corpus_bytes = _du(corpus)

    # same config the scale tier runs everywhere else (bench.py, linearity)
    cfg = IndexConfig(num_shards=32, salt_buckets=4, doc_order="doclen")
    idx = os.path.join(work, "index")

    before = _stage_totals(ui_url)
    t0 = time.time()
    build_index(spark, corpus, idx, cfg, resume=False)
    build_wall = time.time() - t0
    after_build = _stage_totals(ui_url)
    build_m = _delta(after_build, before)

    sizes = {
        name: _du(os.path.join(idx, name))
        for name in ("postings", "docs", "terms", "runs", "mruns")
        if os.path.isdir(os.path.join(idx, name))
    }

    qdf = spark.createDataFrame(gen_queries(tier))
    n_queries = qdf.count()
    search(spark, idx, qdf, "wand").count()  # warmup: page cache, JIT
    before_q = _stage_totals(ui_url)
    t0 = time.time()
    search(spark, idx, qdf, "wand").count()
    query_wall = time.time() - t0
    query_m = _delta(_stage_totals(ui_url), before_q)

    per_turn = {
        "corpus_bytes": corpus_bytes / n_turns,
        "build_shuffle_write_bytes": build_m["shuffleWriteBytes"] / n_turns,
        "build_shuffle_read_bytes": build_m["shuffleReadBytes"] / n_turns,
        "build_input_bytes": build_m["inputBytes"] / n_turns,
        "build_output_bytes": build_m["outputBytes"] / n_turns,
        "build_jvm_cpu_us": build_m["executorCpuTime"] / 1e3 / n_turns,
        "build_task_wall_us": build_m["executorRunTime"] * 1e3 / n_turns,
        "index_postings_bytes": sizes.get("postings", 0) / n_turns,
        "index_total_bytes": sum(sizes.values()) / n_turns,
    }
    out = {
        "tier": tier,
        "n_turns": n_turns,
        "build_wall_sec": round(build_wall, 1),
        "turns_per_sec": round(n_turns / build_wall, 0),
        "corpus_bytes": corpus_bytes,
        "index_bytes": sizes,
        "build_stage_metrics": build_m,
        "query_stage_metrics": query_m,
        "n_queries": n_queries,
        "query_wall_sec": round(query_wall, 2),
        "query_shuffle_read_per_query": query_m["shuffleReadBytes"] / n_queries,
        "query_input_per_query": query_m["inputBytes"] / n_queries,
        "per_turn": {k: round(v, 3) for k, v in per_turn.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
