"""Scaling-efficiency benchmark on a REAL Spark standalone cluster.

`scripts/scaling_bench.py` evidences the north rule's N -> 4N criterion with
pinned local[N] legs — one JVM, task-slot parallelism. This variant runs the
SAME jobs through the full cluster stack on this box: a standalone Master, N
single-core Worker daemons (each `taskset`-pinned to its own physical core),
separate executor JVMs launched by the workers, and the driver submitted via
`spark-submit --py-files` exactly as the north rule prescribes. Unlike
local[N], the 4-executor leg's shuffle crosses JVM boundaries through netty
block transfers with real serialization, and the package travels to executor
Python workers through the --py-files zip — so this is the closest a single
box gets to "two cluster sizes".

Topology (32-core box): executor cores 0..N-1 (one worker per core), master
pinned to cores 24-25, driver JVM + driver Python pinned to cores 26-31 and
IDENTICAL across legs — the only resource that varies between legs is the
executor core count, mirroring a real cluster where the driver node is fixed
and executors are added. All daemons bind 127.0.0.1 (the sandbox has no DNS).

Build legs run a fresh index each (jobs/build_index.py); query legs sweep the
SAME prebuilt index (built once, cost excluded) with an untimed first pass so
both legs run page-cache-warm (jobs/run_queries.py twice, second timed).

Prints one JSON line:
  {"per_execs": {...}, "build_speedup": x, "scaling_efficiency": eff, ...}
with eff = (thr_4N / thr_N) / (4N/N); target >= 0.8.

Usage: python scripts/cluster_scaling_bench.py [tier] [N,4N]  (default: scale 1,4)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = None  # resolved in main
MASTER_URL = "spark://127.0.0.1:7077"
MASTER_REST = "http://127.0.0.1:8080/json/"

# prctl(PR_SET_THP_DISABLE) shim: THP_DISABLE inherits across fork/exec, so
# wrapping the daemon launch covers the worker AND the executor JVMs it
# spawns (session.disable_thp documents why THP matters on this box)
_PRCTL_EXEC = (
    "import ctypes,os,sys;"
    "ctypes.CDLL('libc.so.6').prctl(41,1,0,0,0);"
    "os.execvp(sys.argv[1], sys.argv[1:])"
)


def _spawn(argv: list[str], log_path: str, cpus: str,
           env: dict[str, str]) -> subprocess.Popen:
    log = open(log_path, "w")
    cmd = ["taskset", "-c", cpus, sys.executable, "-c", _PRCTL_EXEC] + argv
    return subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env)


def _alive_workers() -> int:
    try:
        with urllib.request.urlopen(MASTER_REST, timeout=5) as r:
            return int(json.load(r).get("aliveworkers", 0))
    except Exception:
        return -1


def _wait(pred, timeout: float, what: str) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return
        time.sleep(1.0)
    raise RuntimeError(f"timeout waiting for {what}")


def _zip_package(out: str) -> None:
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "elastichash_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))


def _submit(job: str, job_args: list[str], n_execs: int, env: dict[str, str],
            pkg_zip: str, log_path: str) -> dict:
    """spark-submit one job against the running cluster; return its JSON line."""
    cmd = [
        "taskset", "-c", "26-31",
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", MASTER_URL,
        "--py-files", pkg_zip,
        "--conf", f"spark.cores.max={n_execs}",
        "--conf", "spark.executor.cores=1",
        "--conf", "spark.executor.memory=12g",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.driver.host=127.0.0.1",
        "--conf", "spark.driver.bindAddress=127.0.0.1",
        "--conf", f"spark.sql.shuffle.partitions={max(8, 2 * n_execs)}",
        # parity with get_spark's local methodology: 32 MiB scan splits so a
        # ~440 MB corpus fans out past 4 slots (the 128 MiB default gives
        # 5-task scan stages — a 2.5x ceiling on a 4-slot leg); on a real
        # TB-scale cluster raise back to 128 MiB+
        "--conf", "spark.sql.files.maxPartitionBytes=33554432",
        # all executors share this host: PROCESS_LOCAL vs NODE_LOCAL is a
        # distinction without a difference, don't let the scheduler hold
        # task slots idle waiting for it (3s/stage default adds up over the
        # build's 66 stages — measured on the first sample of this script)
        "--conf", "spark.locality.wait=0s",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=16384",
        "--conf", "spark.executor.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, "elastichash_spark", "jobs", job),
    ] + job_args
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    with open(log_path, "w") as f:
        f.write(res.stdout + "\n--- stderr ---\n" + res.stderr)
    if res.returncode != 0:
        raise RuntimeError(f"{job} failed (see {log_path}): "
                           f"{res.stderr.strip().splitlines()[-5:]}")
    for line in reversed(res.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{job}: no JSON line in stdout (see {log_path})")


def main() -> None:
    global SPARK_HOME
    import pyspark

    SPARK_HOME = os.path.dirname(pyspark.__file__)
    tier = sys.argv[1] if len(sys.argv) > 1 else "scale"
    execs = (1, 4)
    if len(sys.argv) > 2:
        lo, hi = sys.argv[2].split(",")
        execs = (int(lo), int(hi))

    work = f"/tmp/eh_cluster_{tier}"
    os.makedirs(os.path.join(work, "logs"), exist_ok=True)
    env = {
        **os.environ,
        "SPARK_HOME": SPARK_HOME,
        "SPARK_LOCAL_IP": "127.0.0.1",
        "SPARK_MASTER_HOST": "127.0.0.1",
        "SPARK_NO_DAEMONIZE": "1",
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    pkg_zip = os.path.join(work, "elastichash_spark.zip")
    _zip_package(pkg_zip)

    # shared input + shared query-leg index + 8-seed query sweep, generated
    # once with an ordinary local session (cost excluded from every leg)
    corpus = os.path.join(work, "transcripts.parquet")
    shared_idx = os.path.join(work, "index_shared")
    queries_pq = os.path.join(work, "queries.parquet")
    mining_pq = os.path.join(work, "mining_queries.parquet")
    if not os.path.exists(os.path.join(mining_pq, "_SUCCESS")):
        from elastichash_spark.build import IndexConfig, build_index
        from elastichash_spark.fixtures import gen_queries, gen_transcripts_spark
        from elastichash_spark.session import get_spark

        spark = get_spark(app_name="eh-cluster-prep", cores=os.cpu_count() or 32)
        gen_transcripts_spark(spark, tier).write.mode("overwrite").parquet(corpus)
        build_index(spark, corpus, shared_idx,
                    IndexConfig(num_shards=32, salt_buckets=4, doc_order="doclen"),
                    resume=True)
        import pandas as pd

        qpd = pd.concat(
            [gen_queries(tier, seed=s).assign(qid=lambda d, s=s: d.qid + s * 1_000_000)
             for s in range(8)],
            ignore_index=True,
        )
        spark.createDataFrame(qpd).write.mode("overwrite").parquet(queries_pq)
        # mining sweep: 2,000 60-char probes cut from the corpus's own
        # turns (the query-by-document regime search_mining serves) —
        # deterministic under the stable (conv_id, turn_idx) order
        from pyspark.sql import functions as F

        (spark.read.parquet(corpus)
         .orderBy("conv_id", "turn_idx").limit(2000)
         .select(
             F.monotonically_increasing_id().alias("qid"),
             F.substring("text", 1, 60).alias("text"))
         .coalesce(1)
         .write.mode("overwrite").parquet(mining_pq))
        spark.stop()

    master = _spawn(
        [os.path.join(SPARK_HOME, "bin", "spark-class"),
         "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8080"],
        os.path.join(work, "logs", "master.log"), "24,25", env,
    )
    results: dict[str, dict] = {}
    workers: list[subprocess.Popen] = []
    try:
        _wait(lambda: _alive_workers() >= 0, 60, "master REST")
        for n in execs:
            for i in range(n):
                workers.append(_spawn(
                    [os.path.join(SPARK_HOME, "bin", "spark-class"),
                     "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                     "--host", "127.0.0.1", "--cores", "1", "--memory", "14g",
                     "--work-dir", os.path.join(work, f"worker_{n}_{i}"),
                     "--webui-port", str(8100 + i)],
                    os.path.join(work, "logs", f"worker_{n}_{i}.log"),
                    str(i), env,
                ))
            _wait(lambda: _alive_workers() == n, 120, f"{n} workers ALIVE")

            idx_dir = os.path.join(work, f"index_{n}")
            shutil.rmtree(idx_dir, ignore_errors=True)
            build = _submit(
                "build_index.py",
                ["--input", corpus, "--output", idx_dir,
                 "--num-shards", "32", "--no-resume"],
                n, env, pkg_zip,
                os.path.join(work, "logs", f"build_{n}.log"),
            )
            # query leg: same prebuilt index for both legs; first pass
            # untimed (page cache + executor JIT warm), second recorded
            for rep in ("warm", "timed"):
                q = _submit(
                    "run_queries.py",
                    ["--index", shared_idx, "--queries", queries_pq],
                    n, env, pkg_zip,
                    os.path.join(work, "logs", f"query_{n}_{rep}.log"),
                )
            # mining leg: the driver-free batched path (search_mining) —
            # one run per leg (no warm pass: each spark-submit app JITs
            # cold, identically on both legs; the page cache is already
            # warm from the query legs over the same shared index)
            mine = _submit(
                "run_mining.py",
                ["--index", shared_idx, "--queries", mining_pq,
                 "--output", os.path.join(work, f"mining_out_{n}")],
                n, env, pkg_zip,
                os.path.join(work, "logs", f"mining_{n}.log"),
            )
            results[str(n)] = {
                "build_wall_sec": round(build["wall_sec"], 2),
                "turns_per_sec": round(build["turns_per_sec"], 1),
                "turns": build["turns"],
                "query_wall_sec": round(q["wall_sec"], 2),
                "queries_per_sec": round(q["n_queries"] / q["wall_sec"], 1),
                "query_result_rows": q["result_rows"],
                "mining_wall_sec": round(mine["wall_sec"], 2),
                "mining_queries_per_sec": round(
                    mine["queries"] / mine["wall_sec"], 1),
                "mining_result_rows": mine["result_rows"],
            }
            for w in workers:
                w.terminate()
            for w in workers:
                w.wait(timeout=30)
            workers.clear()
            _wait(lambda: _alive_workers() == 0, 60, "workers gone")
    finally:
        for w in workers:
            w.terminate()
        master.terminate()

    lo, hi = str(execs[0]), str(execs[1])
    n_turns = results[lo].pop("turns")
    results[hi].pop("turns")
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    q_speedup = results[hi]["queries_per_sec"] / results[lo]["queries_per_sec"]
    m_speedup = (results[hi]["mining_queries_per_sec"]
                 / results[lo]["mining_queries_per_sec"])
    ratio = execs[1] / execs[0]
    print(json.dumps({
        "mode": "standalone-cluster (separate master/worker/executor JVMs, "
                "spark-submit --py-files, 1 core per executor, pinned)",
        "tier": tier,
        "turns": n_turns,
        "executors": list(execs),
        "per_execs": results,
        "build_speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / ratio, 3),
        "query_speedup": round(q_speedup, 3),
        "query_scaling_efficiency": round(q_speedup / ratio, 3),
        "mining_speedup": round(m_speedup, 3),
        "mining_scaling_efficiency": round(m_speedup / ratio, 3),
        "criterion": "eff = (thr_4N/thr_N)/(4N/N), target >= 0.8",
    }))


if __name__ == "__main__":
    main()
