from .events import generate_change_events  # noqa: F401
