"""S4/S5: prediction CSV source/sink — ``vid,category_id`` lines with no
header (written ``inference.py:49-53``, parsed ``evaluate.py:7-19``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.StringType()),
        T.StructField("category_id", T.StringType()),
    ]
)


def read_predictions_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PREDICTION_SCHEMA).option("header", "false").csv(path)


def write_predictions_csv(
    df: DataFrame, path: str, single_file: bool = False, order_by: str | None = "vid"
) -> None:
    """The reference emits one ordered CSV (``inference.py:50-53``). At
    scale, never coalesce(1) — ``single_file`` exists only for
    submission-artifact parity on small outputs; the default writes one
    file per partition."""
    out = df.select("vid", "category_id")
    if order_by:
        out = out.orderBy(order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", "false").csv(path)
