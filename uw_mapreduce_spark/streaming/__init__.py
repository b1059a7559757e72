from .sliding import sliding_event_time_sum, stream_events

__all__ = ["sliding_event_time_sum", "stream_events"]
