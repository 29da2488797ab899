"""S1: annotation JSON source — the reference's primary input
(``json.load`` of an array-of-objects file, ``data_helper.py:89-90``).

Schema is the A1 record shape (FIXTURES.md §A1) and is always declared:
schema inference over 100 TB of JSON is a full extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ANNOTATION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("asr", T.StringType()),
        T.StructField(
            "ocr",
            T.ArrayType(T.StructType([T.StructField("text", T.StringType())])),
        ),
        T.StructField("category_id", T.StringType()),
    ]
)


def read_annotations_json(spark: SparkSession, path: str) -> DataFrame:
    """Array-of-objects JSON (the reference's file layout) needs multiLine;
    JSON-lines (the at-scale layout — splittable!) reads with the same call
    minus multiLine. Both under the declared schema."""
    return spark.read.schema(ANNOTATION_SCHEMA).option("multiLine", "true").json(path)


def read_annotations_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(ANNOTATION_SCHEMA).json(path)


def write_annotations_json(df: DataFrame, path: str) -> None:
    """S7-style JSON sink (JSON-lines; splittable, appendable)."""
    df.write.mode("overwrite").json(path)
