from .events import events_stream, run_available_now, stream_daily_rollup  # noqa: F401
