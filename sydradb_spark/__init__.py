"""sydradb_spark — a PySpark-native rebuild of the sydraDB query surface.

The reference (theroutercompany/sydradb, Zig) is an embeddable single-node
time-series database: one logical table of ``(series, tags, ts, value)``
points, queried through a small SQL-ish language ("sydraQL") with
scan/filter/project/aggregate/sort/limit plus time-series functions
(time_bucket, rate/irate/delta/integral, lag/lead/moving_avg/ema, FILL).

This package re-expresses that capability Spark-first:

- storage: hour-bucket-partitioned Parquet (replaces WAL/segments/manifest,
  reference src/sydra/storage/segment.zig, manifest.zig, wal.zig);
- query: a Python sydraQL front-end (lexer/parser/validator) compiling to
  DataFrame transformations so Catalyst/Tungsten replace the reference's
  optimizer + Volcano executor (reference src/sydra/query/*);
- beyond-reference: large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) under ``pipeline/``.
"""

__version__ = "0.1.0"

from sydradb_spark.model import (  # noqa: F401
    POINTS_SCHEMA,
    hour_bucket,
    series_id,
    canonical_tags_json,
)
from sydradb_spark.sydraql.engine import SydraQLEngine  # noqa: F401
