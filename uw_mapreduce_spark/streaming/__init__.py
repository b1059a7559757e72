from .maintenance import RollupMaintainer, maintain_rollup
from .sliding import sliding_event_time_sum, stream_events

__all__ = [
    "RollupMaintainer",
    "maintain_rollup",
    "sliding_event_time_sum",
    "stream_events",
]
