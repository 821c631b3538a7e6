"""forklift_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Generalizes the reference's (edgeflip/forklift — declarative row-mapping ETL:
mapper -> transform -> loader chains with column-mapping specs; reference tree
empty in this sandbox, see SURVEY.md §0) capabilities into a Structured
Streaming pipeline:

  binlog/WAL-style change feed  ->  in-batch LWW dedupe  ->  key-partitioned
  copy-on-write MERGE INTO an Iceberg-semantics lake table ("lakette") with
  idempotent epoch-commit markers (exactly-once), additive schema evolution,
  salted repartitioning for hot-key skew, per-partition lineage and metrics,
  checkpoint resume.

Design stance (SURVEY.md §7): DataFrame/SQL + Catalyst for all relational
work; custom Python code only where Spark has no primitive (table format,
merge protocol, exactly-once markers, lineage) — and that custom code is
*planning* code, never a row-level execution path.
"""

__version__ = "0.1.0"
