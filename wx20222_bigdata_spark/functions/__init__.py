"""Scalar/vector helper expressions and pandas UDFs.

Builtin-first: everything expressible with ``pyspark.sql.functions`` stays
JVM-side; pandas UDFs exist only for genuinely non-SQL kernels (model
scoring, tokenizer vocabularies) and are Arrow-batched, never row-at-a-time.
"""
