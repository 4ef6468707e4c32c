from .lake import ConcurrentWriteError, LakeTable, MergeResult  # noqa: F401
from .merge_into import merge_into  # noqa: F401
from .iceberg_export import to_iceberg_metadata  # noqa: F401
