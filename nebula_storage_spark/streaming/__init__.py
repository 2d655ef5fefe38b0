from .window import (stream_click_purchase_join, stream_distinct_keys,
                     stream_events_windowed)

__all__ = ["stream_click_purchase_join", "stream_distinct_keys",
           "stream_events_windowed"]
