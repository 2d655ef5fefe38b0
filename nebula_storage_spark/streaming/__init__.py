from .window import stream_distinct_keys, stream_events_windowed

__all__ = ["stream_distinct_keys", "stream_events_windowed"]
