"""S2/S3: per-key binary file scan — the reference's one-``.npy``-per-video
layout (``split_pretrain_data.py:31-33``), read distributed via the
``binaryFile`` source with the key parsed from the file path (J4).

At scale the per-key-file layout is an anti-pattern (millions of tiny
files); the engine reads it once and compacts to parquet (S6 sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_keyed_binary_dir(
    spark: SparkSession, path: str, key_pattern: str = r"([^/]+)\.npy$"
) -> DataFrame:
    """Scan ``{dir}/{key}.npy`` files → (key, content binary, length).

    The key is extracted from the source path column — the distributed
    form of the reference's f-string path lookup."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), key_pattern, 1).alias("key"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
    )
