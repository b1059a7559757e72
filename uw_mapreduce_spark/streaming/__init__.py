from .anomaly import rolling_zscore_stream
from .maintenance import RollupMaintainer, maintain_rollup
from .sliding import sliding_event_time_sum, stream_events, windowed_distinct_users

__all__ = [
    "RollupMaintainer",
    "rolling_zscore_stream",
    "maintain_rollup",
    "sliding_event_time_sum",
    "stream_events",
    "windowed_distinct_users",
]
