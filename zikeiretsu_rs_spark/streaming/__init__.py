from .ingest import start_streaming_ingest, streaming_time_bucket

__all__ = ["start_streaming_ingest", "streaming_time_bucket"]
