from .lww import lww_dedup_agg, lww_dedup_window  # noqa: F401
from .skew import detect_hot_keys, salted_repartition  # noqa: F401
