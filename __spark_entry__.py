"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship two-stage BM25 query (index build + block-
max WAND + exact rescore) over the sf0.001 documents corpus. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus the
training-data operators, each paired with an ANSI-SQL oracle for DuckDB —
except the two approximate-ANN entries (LSH and IVF), which are rows-only by
design and carry measured recall/mAP floors in pytest instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable by executor Python workers regardless of
    the driver's launch cwd (the --py-files path for ad-hoc sessions)."""
    try:
        from elastichash_spark.session import _ship_package

        _ship_package(spark)
    except Exception:
        pass  # already added or running under spark-submit --py-files


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    from elastichash_spark import suite

    return suite.q_bm25_twostage(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from elastichash_spark import suite

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in suite.queries().items()}


def oracle_sql() -> dict[str, str]:
    from elastichash_spark import suite

    return suite.oracle_sql()
