from .reference_pipeline import sliding_events, sliding_events_scalable

__all__ = ["sliding_events", "sliding_events_scalable"]
