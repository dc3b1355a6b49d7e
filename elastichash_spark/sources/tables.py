"""Table-loading seam: Iceberg when available, parquet otherwise.

The engine's corpus abstraction is "an Iceberg table of transcripts"
(BASELINE.json input_hint). This sandbox has no Iceberg runtime jar, so every
reader goes through ``load_table`` — a catalog table name when the Iceberg
catalog is configured, a parquet directory path otherwise (SURVEY.md §7.3) —
and the rest of the engine never knows which. ``iceberg_ddl`` documents the
production layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """``ref`` is a catalog table name (contains no '/') or a parquet path."""
    if "/" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if "/" in ref or ref.endswith(".parquet"):
        df.write.mode(mode).parquet(ref)
    elif mode == "overwrite":
        df.writeTo(ref).createOrReplace()
    else:
        df.writeTo(ref).append()


def iceberg_ddl(table: str, n_buckets: int = 64) -> str:
    """Production DDL for the transcript corpus: bucketed by conv_id so one
    conversation's turns co-locate (the per-conversation read path), with ts
    days for partition pruning on time-ranged scans."""
    return (
        f"CREATE TABLE {table} ("
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp) USING iceberg "
        f"PARTITIONED BY (days(ts), bucket({n_buckets}, conv_id))"
    )
