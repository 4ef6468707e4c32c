from .lake import ConcurrentWriteError, LakeTable, MergeResult  # noqa: F401
