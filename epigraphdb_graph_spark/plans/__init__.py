from .lake import LakeTable, MergeResult  # noqa: F401
