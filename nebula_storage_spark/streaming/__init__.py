from .window import stream_events_windowed

__all__ = ["stream_events_windowed"]
