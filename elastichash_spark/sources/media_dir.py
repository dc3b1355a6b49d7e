"""Directory scan of raw media files → the typed media table.

Transposes the reference's directory importer
(``/root/reference/dh/tools/import_dir.py:182-188``: ``os.walk`` over an
image tree, extension filter, per-file read + feature extraction) to the
Spark-native ``binaryFile`` source: a distributed, splittable-by-file scan
that returns ``(path, modificationTime, length, content)`` rows without the
driver touching a single byte. Extension → modality mapping replaces the
importer's hardcoded image filter, and the output shape matches the engine's
media table (``operators/multimodal.py``) so decode/feature/frame operators
run unchanged on files from disk.

At scale: binaryFile parallelizes across files (one file = one task unit,
grouped into splits by ``spark.sql.files.maxPartitionBytes``) and pushes the
glob filter into file listing — no bytes are read for filtered-out paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> modality (the importer's IMG_EXTENSIONS analogue, extended to
# the three modalities the media operators understand)
MODALITY_BY_EXT = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "bmp": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "mp4": "video", "mkv": "video", "webm": "video", "avi": "video", "mov": "video",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Scan a directory tree of media files into the media table shape:
    (media_id, modality, payload, mime, width, height, duration_ms, path).

    media_id is the 60-bit hash of the file path relative to ``path`` —
    deterministic across runs and clusters (never
    monotonically_increasing_id). Unknown extensions map to modality
    'other' so callers can filter or fail loudly. width/height/duration_ms
    are NULL until a real decoder fills them (multimodal.decode_features).
    """
    from ..operators.hashing import h60_col

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    base = os.path.abspath(path).rstrip("/") + "/"
    # prefix strip via substring arithmetic, NOT a regex: a base directory
    # containing regex metacharacters ('+', '(', ...) would corrupt or
    # break a regexp_replace pattern and with it the deterministic-id
    # contract (media_id = h60(relative path))
    prefix = "file:" + base
    relpath = F.when(
        F.col("path").startswith(prefix),
        F.col("path").substr(F.lit(len(prefix) + 1), F.length("path")),
    ).otherwise(F.col("path"))
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    modality_map = F.create_map(
        *[F.lit(x) for kv in MODALITY_BY_EXT.items() for x in kv]
    )
    return df.select(
        h60_col(relpath).alias("media_id"),
        F.coalesce(modality_map[ext], F.lit("other")).alias("modality"),
        F.col("content").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        relpath.alias("path"),
    )
