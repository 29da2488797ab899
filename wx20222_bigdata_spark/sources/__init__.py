"""File sources and sinks (SURVEY.md §2.1 S1-S7).

Production rules: JSON reads always declare schemas (never inference);
sinks control file counts explicitly (``repartition`` + ``maxRecordsPerFile``
— the reference's 22-shard compaction, ``split_pretrain_data.py:28-35``);
binary payloads come through ``binaryFile`` with the join key derived from
the path (``input_file_name``), never loaded driver-side.
"""

from wx20222_bigdata_spark.sources.annotations import (  # noqa: F401
    ANNOTATION_SCHEMA,
    read_annotations_json,
    write_annotations_json,
)
from wx20222_bigdata_spark.sources.csv_io import (  # noqa: F401
    PREDICTION_SCHEMA,
    read_predictions_csv,
    write_predictions_csv,
)
from wx20222_bigdata_spark.sources.binary_files import (  # noqa: F401
    read_keyed_binary_dir,
)
from wx20222_bigdata_spark.sources.sinks import (  # noqa: F401
    write_compacted_parquet,
    write_json_manifest,
    write_sharded_parquet,
)
