"""Index build — offline, parallel, staged, resumable.

Transposes the reference's bulk index build (``/root/reference/dh/tools/
import_csv.py``: CSV scan -> per-row doc transform -> 4 threads x 40-doc
batched ``_bulk`` sinks into 3 ES shards) into a Spark-first pipeline:

  stage docs      tokenize (Arrow UDF) + deterministic docID + doc shard
  stage terms     corpus stats (N, avgdl, df) + deterministic termID + idf
  stage tf        (termID, docID, tf, doclen, shard, salt), salt-partitioned
  stage runs/S=s  per salt bucket: salted repartition by (termID, shard) ->
                  sorted, delta+varbyte-encoded posting runs
  stage postings  merge the S salted runs per (termID, shard) into final
                  128-posting blocks with per-block max BM25 impact metadata
                  (the block-max WAND analogue of the reference's precomputed
                  ``nbs`` pruning index, ``dh/tools/create_nbs_index.py``)

Shards are docID ranges — the analogue of the reference's 3 ES shards
(``import_csv.py:31``): every doc's postings live wholly inside one shard, so
query-time scoring is shard-local with a global top-k merge, exactly ES's
per-shard-heap-then-merge execution.

Skew: hot terms (Zipf head) would make a plain repartition-by-term straggle;
runs are therefore built per (termID, shard, salt) with salt = docID % S and
merged in a second pass — the salted repartition-and-merge required by the
north rule. The merged result is provably independent of S (postings are
re-sorted by unique docID), which tests assert byte-identically.

Every stage writes parquet then a manifest (lineage + per-partition rows and
bytes); a rerun of ``build_index`` with the same config skips completed
stages, so a killed build resumes where it stopped (FIXTURES.md §4.7).
"""

from __future__ import annotations

import math
import os
from collections.abc import Iterator
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codec, scoring
from .ids import with_ordinal
from .manifest import read_manifest, stage_complete, write_manifest
from .tokenize import TOKEN_SPLIT_RE, with_term_freqs


@dataclass(frozen=True)
class IndexConfig:
    num_shards: int = 8          # docID-range shards (ES shard analogue)
    salt_buckets: int = 4        # S in the salted repartition-and-merge
    block_size: int = 128        # postings per block (Lucene uses 128)
    run_partitions: int = 0      # shuffle width for run building; 0 = default


RUNS_SCHEMA = (
    "termID long, shard int, salt int, n int, first_docID long, "
    "last_docID long, nbytes int, blob binary, build_pid int"
)
POSTINGS_SCHEMA = (
    "termID long, shard int, block_id int, n int, first_docID long, "
    "last_docID long, max_impact double, blob binary"
)


def _stage(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def _partition_metrics(df: DataFrame, rows_col: str = "n", bytes_col: str = "nbytes"):
    """Per-partition (run-level) row/byte metrics for the manifest."""
    agg = (
        df.groupBy("build_pid")
        .agg(
            F.count("*").alias("runs"),
            F.sum(rows_col).alias("rows"),
            F.sum(bytes_col).alias("bytes"),
        )
        .collect()
    )
    return {
        str(r["build_pid"]): {"runs": r["runs"], "rows": int(r["rows"]), "bytes": int(r["bytes"])}
        for r in agg
    }


def _encode_runs_arrow(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """mapInArrow kernel: partition rows sorted by (termID, shard, salt, docID)
    -> one encoded run per (termID, shard, salt) group."""
    tbl = pa.Table.from_batches(list(batches))
    if tbl.num_rows == 0:
        return
    term = tbl.column("termID").to_numpy()
    shard = tbl.column("shard").to_numpy()
    salt = tbl.column("salt").to_numpy()
    doc = tbl.column("docID").to_numpy()
    tf = tbl.column("tf").to_numpy()
    dl = tbl.column("doclen").to_numpy()
    pid = int(tbl.column("build_pid")[0].as_py())
    # group boundaries on the (termID, shard, salt) sort prefix
    change = (np.diff(term) != 0) | (np.diff(shard) != 0) | (np.diff(salt) != 0)
    starts = np.concatenate([[0], np.flatnonzero(change) + 1])
    ends = np.concatenate([starts[1:], [len(term)]])
    out = {k: [] for k in ("termID", "shard", "salt", "n", "first_docID", "last_docID", "nbytes", "blob", "build_pid")}
    for s, e in zip(starts, ends):
        d = doc[s:e]
        blob = codec.encode_run(d, tf[s:e], dl[s:e])
        out["termID"].append(int(term[s]))
        out["shard"].append(int(shard[s]))
        out["salt"].append(int(salt[s]))
        out["n"].append(int(e - s))
        out["first_docID"].append(int(d[0]))
        out["last_docID"].append(int(d[-1]))
        out["nbytes"].append(len(blob))
        out["blob"].append(blob)
        out["build_pid"].append(pid)
    yield pa.RecordBatch.from_pydict(
        out,
        schema=pa.schema(
            [
                ("termID", pa.int64()),
                ("shard", pa.int32()),
                ("salt", pa.int32()),
                ("n", pa.int32()),
                ("first_docID", pa.int64()),
                ("last_docID", pa.int64()),
                ("nbytes", pa.int32()),
                ("blob", pa.binary()),
                ("build_pid", pa.int32()),
            ]
        ),
    )


def _merge_runs_factory(block_size: int, avgdl: float):
    """applyInPandas kernel: the S salted runs of one (termID, shard) ->
    final docID-sorted blocks with block-max impact metadata."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        term_id = int(pdf["termID"].iloc[0])
        shard = int(pdf["shard"].iloc[0])
        idf = float(pdf["idf"].iloc[0])
        parts = [codec.decode_run(b, int(n)) for b, n in zip(pdf["blob"], pdf["n"])]
        doc = np.concatenate([p[0] for p in parts])
        tf = np.concatenate([p[1] for p in parts])
        dl = np.concatenate([p[2] for p in parts])
        order = np.argsort(doc, kind="stable")  # docIDs unique across salts
        doc, tf, dl = doc[order], tf[order], dl[order]
        rows = []
        for bi, (s, e) in enumerate(codec.split_blocks(len(doc), block_size)):
            blob = codec.encode_run(doc[s:e], tf[s:e], dl[s:e])
            max_imp = float(idf * scoring.tf_part_np(tf[s:e], dl[s:e], avgdl).max())
            rows.append(
                (term_id, shard, bi, e - s, int(doc[s]), int(doc[e - 1]), max_imp, blob)
            )
        return pd.DataFrame(
            rows,
            columns=[
                "termID", "shard", "block_id", "n",
                "first_docID", "last_docID", "max_impact", "blob",
            ],
        )

    return merge


def build_index(
    spark: SparkSession,
    transcripts: DataFrame | str,
    index_dir: str,
    config: IndexConfig = IndexConfig(),
    resume: bool = True,
    run_id: str = "run0",
    id_cols: list[str] | None = None,
    text_col: str = "text",
) -> dict:
    """Build (or resume building) the full index under ``index_dir``.

    ``id_cols`` is the corpus's unique document key (default transcript key
    ``(conv_id, turn_idx)``); docID is the deterministic global rank over it.
    Returns the final meta dict (also persisted as ``meta.json``).
    """
    id_cols = id_cols or ["conv_id", "turn_idx"]
    if isinstance(transcripts, str):
        lineage_input = transcripts
        transcripts = spark.read.parquet(transcripts)
    else:
        lineage_input = "<in-memory DataFrame>"
    os.makedirs(index_dir, exist_ok=True)
    conf = asdict(config)
    base_expect = {
        "config": conf, "input": lineage_input,
        "id_cols": id_cols, "text_col": text_col,
    }

    # ---- stage 1: docs — tokenize + docID + shard (also the forward table:
    # metadata travels unindexed, like the reference's index:false stored
    # fields, import_csv.py:114-115; parquet column pruning makes it free)
    docs_dir = _stage(index_dir, "docs")
    if not (resume and stage_complete(docs_dir, base_expect)):
        toks = with_term_freqs(transcripts, text_col)
        docs = with_ordinal(toks, id_cols, "docID")
        n_docs = docs.count()
        shard_size = max(1, math.ceil(n_docs / config.num_shards))
        docs = docs.withColumn(
            "shard", (F.col("docID") / F.lit(shard_size)).cast("int")
        )
        docs.write.mode("overwrite").parquet(docs_dir)
        write_manifest(
            docs_dir,
            {**base_expect, "stage": "docs", "run_id": run_id,
             "rows": n_docs, "shard_size": shard_size},
        )
    docs_meta = read_manifest(docs_dir)
    n_docs, shard_size = docs_meta["rows"], docs_meta["shard_size"]
    docs = spark.read.parquet(docs_dir)

    # ---- stage 2: terms — df per term, deterministic termID, idf
    # (the DataFrame-aggregate analogue of ES cluster stats, dh/app/util.py:242-244)
    terms_dir = _stage(index_dir, "terms")
    if not (resume and stage_complete(terms_dir, base_expect)):
        avgdl = float(
            docs.agg(F.avg(F.col("doclen").cast("double"))).collect()[0][0] or 0.0
        )
        tf_flat = docs.select("docID", F.explode("pairs").alias("p")).select(
            F.col("p.term").alias("term")
        )
        dfreq = tf_flat.groupBy("term").agg(F.count("*").alias("df"))
        tdict = with_ordinal(dfreq, [("df", "desc"), "term"], "termID")
        tdict = tdict.withColumn(
            "idf", scoring.idf_col(n_docs, F.col("df").cast("double"))
        )
        tdict.write.mode("overwrite").parquet(terms_dir)
        write_manifest(
            terms_dir,
            {**base_expect, "stage": "terms", "run_id": run_id,
             "rows": tdict.count(), "avgdl": avgdl, "n_docs": n_docs},
        )
    terms_meta = read_manifest(terms_dir)
    avgdl, n_terms = terms_meta["avgdl"], terms_meta["rows"]
    tdict = spark.read.parquet(terms_dir)

    # ---- stage 3: tf — exploded postings with shard + salt, salt-partitioned
    tf_dir = _stage(index_dir, "tf")
    if not (resume and stage_complete(tf_dir, base_expect)):
        tf = (
            docs.select("docID", "doclen", "shard", F.explode("pairs").alias("p"))
            .select(
                "docID", "doclen", "shard",
                F.col("p.term").alias("term"), F.col("p.tf").alias("tf"),
            )
            .join(tdict.select("term", "termID"), "term")
            .withColumn("salt", (F.col("docID") % F.lit(config.salt_buckets)).cast("int"))
            .select("termID", "docID", "tf", "doclen", "shard", "salt")
        )
        tf.write.mode("overwrite").partitionBy("salt").parquet(tf_dir)
        write_manifest(
            tf_dir,
            {**base_expect, "stage": "tf", "run_id": run_id,
             "rows": spark.read.parquet(tf_dir).count()},
        )

    # ---- stage 4: runs — one resumable sub-stage per salt bucket
    # (per-partition checkpoints: a killed build resumes at bucket granularity)
    runs_root = _stage(index_dir, "runs")
    n_parts = config.run_partitions or spark.sparkContext.defaultParallelism * 2
    for s in range(config.salt_buckets):
        salt_dir = os.path.join(runs_root, f"salt={s}")
        expect = {**base_expect, "salt": s}
        if resume and stage_complete(salt_dir, expect):
            continue
        tf_s = spark.read.parquet(tf_dir).where(F.col("salt") == s)
        runs = (
            tf_s.repartition(n_parts, "termID", "shard")
            .sortWithinPartitions("termID", "shard", "salt", "docID")
            .withColumn("build_pid", F.spark_partition_id())
            .mapInArrow(_encode_runs_arrow, RUNS_SCHEMA)
        )
        runs.write.mode("overwrite").parquet(salt_dir)
        written = spark.read.parquet(salt_dir)
        write_manifest(
            salt_dir,
            {**expect, "stage": f"runs/salt={s}", "run_id": run_id,
             "partitions": _partition_metrics(written)},
        )

    # ---- stage 5: postings — merge salted runs, final blocks + block-max
    postings_dir = _stage(index_dir, "postings")
    if not (resume and stage_complete(postings_dir, base_expect)):
        runs = spark.read.parquet(runs_root).drop("build_pid")
        # equi-join on termID; Catalyst/AQE picks broadcast while the dict is
        # small and falls back to sort-merge at billion-term scale
        runs = runs.join(tdict.select("termID", "idf"), "termID")
        merged = runs.groupBy("termID", "shard").applyInPandas(
            _merge_runs_factory(config.block_size, avgdl), POSTINGS_SCHEMA
        )
        # layout for query-time pruning: hive-partitioned by shard, row-groups
        # sorted by termID so parquet min/max stats prune non-query terms
        (
            merged.repartition(config.num_shards, "shard")
            .sortWithinPartitions("termID", "block_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(postings_dir)
        )
        written = spark.read.parquet(postings_dir)
        stats = written.agg(
            F.count("*").alias("blocks"),
            F.sum("n").alias("postings"),
            F.sum(F.length("blob")).alias("bytes"),
        ).collect()[0]
        write_manifest(
            postings_dir,
            {**base_expect, "stage": "postings", "run_id": run_id,
             "blocks": stats["blocks"], "postings": int(stats["postings"]),
             "bytes": int(stats["bytes"])},
        )

    meta = {
        "run_id": run_id,
        "input": lineage_input,
        "config": conf,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": n_terms,
        "shard_size": shard_size,
        "tokenizer_split": TOKEN_SPLIT_RE,
        "bm25": {"k1": scoring.K1, "b": scoring.B,
                 "idf": "ln((N-df+0.5)/(df+0.5)+1)"},
    }
    write_manifest(index_dir, {**meta, "stage": "meta"})
    return meta


def load_index(spark: SparkSession, index_dir: str):
    """(meta, docs_df, terms_df, postings_df) — column-pruned lazy readers."""
    meta = read_manifest(index_dir)
    docs = spark.read.parquet(_stage(index_dir, "docs")).drop("pairs")
    terms = spark.read.parquet(_stage(index_dir, "terms"))
    postings = spark.read.parquet(_stage(index_dir, "postings"))
    return meta, docs, terms, postings
