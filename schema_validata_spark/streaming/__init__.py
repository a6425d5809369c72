from .validate_stream import (stream_dedup,
                              stream_monotonic_ts_violations,
                              stream_partition_verdicts,
                              stream_rate_verdicts,
                              stream_role_conformance, stream_validate)

__all__ = ["stream_validate", "stream_partition_verdicts",
           "stream_rate_verdicts",
           "stream_monotonic_ts_violations", "stream_dedup",
           "stream_role_conformance"]
