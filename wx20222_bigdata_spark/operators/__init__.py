"""Operator modules. Importing this package registers every declared query
(SURVEY.md §2) into :mod:`wx20222_bigdata_spark.registry`."""

from wx20222_bigdata_spark.operators import (  # noqa: F401
    arrays,
    clusters,
    curation,
    decontam,
    dedup,
    etl,
    inference,
    iterative,
    metrics,
    misc,
    multimodal,
    packing,
    relational,
    projections,
    sampling,
    similarity,
    skew,
    stats,
    streaming_batch,
    temporal,
    textstats,
    tokenize,
    windows,
)
