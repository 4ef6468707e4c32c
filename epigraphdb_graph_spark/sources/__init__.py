from .events import generate_change_events  # noqa: F401
from .readers import (  # noqa: F401
    read_delimited,
    read_headerless,
    read_json_records,
    read_wide_matrix,
)
from .ingest import Dataset, ingest, ingest_all  # noqa: F401
from .api import (  # noqa: F401
    fetch_paged,
    fetch_partitioned,
    fetch_records,
    with_retry,
)
