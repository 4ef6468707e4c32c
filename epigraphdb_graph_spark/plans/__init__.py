from .lake import ConcurrentWriteError, LakeTable, MergeResult  # noqa: F401
from .merge_into import merge_into  # noqa: F401
