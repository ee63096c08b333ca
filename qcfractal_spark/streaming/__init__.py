from .ingest import stream_events_from_directory, windowed_event_counts
from .queue import SingleWriterQueue

__all__ = [
    "stream_events_from_directory",
    "windowed_event_counts",
    "SingleWriterQueue",
]
