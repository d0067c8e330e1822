"""pinterest_data_pipeline400_spark — a PySpark-native analytics engine.

A ground-up, idiomatic PySpark re-implementation of the query and
data-processing capabilities of the reference pipeline
(PoornimaPichandi/pinterest-data-pipeline400): three-entity data model
(pin/geo/user), cleaning transforms, eight analytical queries, and a
Structured-Streaming path — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
pipeline needs.

Design principles (SURVEY.md §4, §7):
  * DataFrame/SQL first — declare the logical plan, let Catalyst pick the
    physical strategy.
  * Explicit schemas everywhere (no JSON inference on the hot path).
  * No row-at-a-time Python UDF on the hot path — native expressions,
    falling back to Arrow-batched pandas UDFs only where built-ins can't
    express the semantics.
  * Columnar at rest (Parquet), partition-pruned scans, broadcast for
    small dimensions, AQE for runtime re-planning.
"""

__version__ = "0.1.0"
