"""wx20222_bigdata_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capability surface of
``HuskyNian/wx20222-bigdata`` (the "竹竹天下第一" WeChat Big Data Challenge 2022
pipeline; see SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal columns,
text analysis) required for 100 TB-scale training-data curation.

Layout
------
- ``session``     : SparkSession factory with scale-ready defaults (AQE, Arrow).
- ``catalog``     : schemas + loaders for the synthetic star-schema tables.
- ``registry``    : query/oracle registration (the driver-facing contract).
- ``operators/``  : relational, aggregate, window, array, sampling, dedup,
                    similarity, text-stats, multimodal, inference operators.
- ``functions/``  : scalar/vector helpers and pandas UDFs (the slow path,
                    used only where no builtin exists).
- ``sources/``    : JSON/CSV/binary-file sources and sinks.
- ``streaming/``  : Structured Streaming surface (windows, watermark, EMA state).
- ``plans/``      : explain/plan-assertion utilities (pushdown, broadcast checks).
"""

__version__ = "0.1.0"
