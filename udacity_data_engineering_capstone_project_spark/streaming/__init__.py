from .events import (  # noqa: F401
    hourly_counts,
    read_events_stream,
    run_hourly_batch,
    sessionized_stream,
)
