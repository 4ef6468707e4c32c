"""Pure-Python/pandas replay oracle (SURVEY.md §5 'replay equality').

Final-state semantics: for each url, take the event with max
(warc_ts, event_seq); if that event is a delete the url is absent;
otherwise the row is (url, warc_ts, html, text=extract_text(html), ...).
This is batching-agnostic by the engine's invariant (see replay.py).

Uses the SAME extract_text function object as the Spark UDF —
byte-identity is structural, not coincidental.
"""

from __future__ import annotations

import pandas as pd

from epigraphdb_graph_spark.functions.extract import extract_text


def replay_oracle(events: pd.DataFrame, payload_cols: list[str] | None = None) -> pd.DataFrame:
    """events: columns event_seq, op, url, warc_ts, html [, lang ...].
    Returns final visible state sorted by url, with extracted text."""
    payload_cols = payload_cols or [
        c for c in events.columns if c not in ("event_seq", "op")
    ]
    ev = events.sort_values(["warc_ts", "event_seq"]).groupby("url", as_index=False).tail(1)
    alive = ev[ev["op"] != "delete"].copy()
    alive["text"] = alive["html"].map(
        lambda b: extract_text(bytes(b)) if b is not None else None
    )
    cols = [c for c in payload_cols if c in alive.columns] + ["text"]
    # keep url first, stable order
    ordered = ["url"] + [c for c in cols if c != "url"]
    return alive[ordered].sort_values("url").reset_index(drop=True)
