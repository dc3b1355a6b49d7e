"""Reader for the reference's code CSV files — its index-build input format.

Row layout (``/root/reference/dh/tools/import_csv.py:180-185,299-346``;
generator ``model/prepare_model/inference_csv.py:42-80``):

    [id, imageurl, thumburl, <codes...>, (license, authorprofileurl, author, title)]

with codes starting at column 3, depending on method:

- ``twostage``: f0..f3 (16-bit unsigned subcodes as decimal strings) then
  r0..r3 (64-bit signed two's-complement longs) — 8 code columns
- ``short``: f0..f3 + r0 (the packed 64-bit code) — 5 columns
- ``long``: f0..f15 (16-bit slices of the 256-bit code) then r0..r3 — 20

The reference streams these rows through 4 threads into ES ``_bulk``; here
the same file is a declarative CSV scan with an explicit schema (no
inference), and the downstream "index" is a plain DataFrame the Hamming
operators (``operators/hamming.py``) consume. ``hd256_topk`` is the es-long
exact scorer: ``Σ_{i<4} (64 − popcount(r_i XOR q_i))`` — the stored Painless
script ``hd64`` applied per subcode and summed
(``dh/tools/add_hdist.py:18-22``, ``es_query.7.x.json:2-55``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_COLS = ("id", "imageurl", "thumburl")
INFO_COLS = ("license", "authorprofileurl", "author", "title")


def codes_schema(method: str = "twostage", imageinfo: bool = False) -> T.StructType:
    fields = [T.StructField(c, T.StringType(), True) for c in META_COLS]
    if method == "twostage":
        f_cols, r_cols = 4, 4
    elif method == "short":
        f_cols, r_cols = 4, 1
    elif method == "long":
        f_cols, r_cols = 16, 4
    else:
        raise ValueError(f"unknown method {method!r}")
    fields += [T.StructField(f"f{i}", T.IntegerType(), True) for i in range(f_cols)]
    fields += [T.StructField(f"r{i}", T.LongType(), True) for i in range(r_cols)]
    if imageinfo:
        fields += [T.StructField(c, T.StringType(), True) for c in INFO_COLS]
    return T.StructType(fields)


def read_codes_csv(
    spark: SparkSession,
    path: str,
    method: str = "twostage",
    imageinfo: bool = False,
    sep: str = ",",
) -> DataFrame:
    """Explicit-schema CSV scan (no inference, like the reference's fixed
    mapping templates, import_csv.py:103-124). The 16-bit f-columns parse as
    int (they are unsigned decimals ≤ 65535); r-columns as signed long."""
    return spark.read.csv(path, schema=codes_schema(method, imageinfo), sep=sep)


def write_codes_csv(
    df: DataFrame,
    path: str,
    method: str = "twostage",
    imageinfo: bool = False,
    sep: str = ",",
    mode: str = "overwrite",
) -> None:
    """CSV sink in the reference's code-file layout (the distributed analogue
    of ``model/prepare_model/inference_csv.py:42-80``, which writes the code
    rows one Python csv.writer line at a time). Headerless, column order
    pinned by :func:`codes_schema`; a read_codes_csv of the output
    round-trips exactly."""
    cols = [f.name for f in codes_schema(method, imageinfo).fields]
    df.select(*cols).write.mode(mode).option("header", "false").csv(path, sep=sep)


def hd256_topk(
    codes: DataFrame, probes: DataFrame, k: int = 10, id_col: str = "id"
) -> DataFrame:
    """Exact 256-bit Hamming top-k over r0..r3 — the es-long rerank score as
    one codegen'd expression; probes: (qid, q0..q3 long).

    Returns (qid, rank, id, score) under (score DESC, id ASC)."""
    score = F.lit(256)
    for i in range(4):
        score = score - F.bit_count(
            F.col(f"r{i}").bitwiseXOR(F.col(f"q{i}")).cast("long")
        )
    scored = codes.crossJoin(F.broadcast(probes)).select(
        "qid", id_col, score.cast("long").alias("score")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", id_col, "score")
    )
