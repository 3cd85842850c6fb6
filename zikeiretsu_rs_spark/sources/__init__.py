"""External-format sources for the ingest path.

The reference ingests only through its library API (DataPoint
vectors); these readers widen that surface to the formats a pipeline
actually receives, normalizing everything to the engine's canonical
block schema (ts long nanos, f0..fn) so `WritableStore.
persist_dataframe` (batch) or `streaming.start_streaming_ingest`
(micro-batch) can land them. All parsing stays JVM-side
(spark.read.* + column expressions)."""

from .readers import read_datapoints_csv, read_datapoints_json  # noqa: F401

__all__ = ["read_datapoints_csv", "read_datapoints_json"]
