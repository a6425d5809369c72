from .validate_stream import stream_validate, stream_partition_verdicts

__all__ = ["stream_validate", "stream_partition_verdicts"]
