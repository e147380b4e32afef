"""Structured Streaming operators beyond the reference's ingest pipeline.

The reference's "streaming" is queue → WAL → memtable → flush with no
late-data policy (SURVEY §2.11). Spark-first this package adds what a real
streaming TSDB layer needs:

- ``rollup_stream``: watermarked event-time bucket aggregation maintained as
  an append-only partial-rollup table (fold partials at read/compaction).
- ``stateful``: custom per-series stateful operators
  (``applyInPandasWithState``) — streaming EMA as the exemplar.
"""
