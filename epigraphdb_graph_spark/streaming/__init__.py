from .tailer import tail_change_log, stream_metrics  # noqa: F401
from .compactor import BackgroundCompactor  # noqa: F401
from .feed import replicate, sync_changes  # noqa: F401
from .matview import maintain_aggregate, read_view  # noqa: F401
