from .tailer import tail_change_log, stream_metrics  # noqa: F401
