"""Portable deterministic hashing shared by dedup/similarity operators.

All hashes are md5-derived so every value is reproducible in any engine
(Spark, DuckDB, Python) — the same property that makes the reference's
16-bit subcodes portable between its CSV pipeline and ES
(``/root/reference/dh/app/util.py:90-97``). Spark's builtin ``hash()`` /
``xxhash64`` are NOT used on any oracle-checked path because other engines
cannot reproduce them.

h60(s) = int(md5(s)[:15], 16) — a 60-bit unsigned value that fits signed
int64 in every engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60_col(c: Column) -> Column:
    """60-bit md5 hash of a string column (JVM-side, codegen'd)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def h60_sql(expr: str) -> str:
    """Equivalent DuckDB SQL fragment."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
