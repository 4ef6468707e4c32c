"""html→text extraction as vectorized pandas/Arrow UDFs.

Generalizes the reference pipeline's per-record entity-extraction
transforms (regex pull of a name out of an HTML anchor,
rels/gwas-gencor.py:52-58; case-folding and strip transforms, SURVEY.md
§2.10 F2/F3/F5) into the engine's html→text stage.

**Byte-identity invariant** (BASELINE.json input_hint): the extracted
``text`` for a url must be byte-identical between the Spark path and the
pytest oracle. Guaranteed structurally: both call the *same pure Python
function* ``extract_text`` — the Spark side merely vectorizes it through a
pandas UDF (Arrow batches; no per-row Python in the executor loop beyond
the shared function itself). The function uses only locale-independent
stdlib ops (re with explicit patterns, html.unescape, str.split).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")


def extract_text(html_bytes: bytes | None) -> str | None:
    """Pure, deterministic html→text. Shared verbatim by the Spark UDF and
    the pytest/pandas oracle (SURVEY.md §5 'byte-identical text').

    The fast-path guards (`<` / `&` membership tests are C-speed scans)
    skip whole regex/unescape passes without changing a single output
    byte: a sub() that cannot match and an unescape() with no ampersand
    are identity transforms."""
    if html_bytes is None:
        return None
    raw = html_bytes if isinstance(html_bytes, bytes) else bytes(html_bytes)
    if b"<" in raw:
        raw = _SCRIPT_RE.sub(b" ", raw)
        raw = _COMMENT_RE.sub(b" ", raw)
        raw = _TAG_RE.sub(b" ", raw)
    text = raw.decode("utf-8", errors="replace")
    if "&" in text:
        text = _html.unescape(text)
    # collapse all unicode whitespace runs to single spaces, trim
    return " ".join(text.split())


class _SessionScopedPandasUDF:
    """Module-level pandas UDF that re-binds on SparkContext restart.

    PySpark's ``UserDefinedFunction`` caches its JVM-side ``_judf`` forever
    (``_judf_placeholder``); the wrapped function embeds the *creating*
    context's PythonAccumulatorV2 (host/port/token of the driver-side
    accumulator server). A module-level ``@pandas_udf`` reused after
    ``spark.stop()`` + new session (bench.py restarts between phases;
    long-lived services do the same) therefore has every task completion
    spam ``ERROR DAGScheduler: Failed to update accumulator 0 ... Broken
    pipe`` against the dead server — benign for results, but log noise.
    Caching per *context id* keeps the one-time-wrap economics while
    re-wrapping exactly when the old binding went stale.
    """

    def __init__(self, fn, return_type):
        self._fn, self._rt = fn, return_type
        self._udf = None
        # weakref to the context the cached _judf was wrapped under. Object
        # IDENTITY via a weakref — not id(sc) — because CPython reuses ids
        # after GC: a new SparkContext can alias a collected one's id and
        # would keep the stale _judf bound to the dead accumulator server
        # (the exact broken-pipe spam this class exists to prevent). A dead
        # weakref returns None, which `is not sc` for any live context, so
        # both "old context collected" and "different live object" rewrap.
        self._ctx_ref = None
        self.__doc__ = fn.__doc__
        self.__name__ = fn.__name__

    def __call__(self, *cols):
        import weakref

        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        if self._udf is None or self._ctx_ref is None or self._ctx_ref() is not sc:
            self._udf = F.pandas_udf(self._fn, self._rt)
            self._ctx_ref = weakref.ref(sc) if sc is not None else None
        return self._udf(*cols)


def _extract_text_series(html: pd.Series) -> pd.Series:
    """Arrow-vectorized wrapper of extract_text (binary -> string)."""
    return html.map(extract_text, na_action="ignore").astype(object).where(html.notna(), None)


extract_text_udf = _SessionScopedPandasUDF(_extract_text_series, T.StringType())


# --------------------------------------------------------------------------
# Language guess: marker-stopword heuristic (deterministic; used both as an
# engine function and as a documents-table analytics query). Kept simple &
# SQL-expressible so a DuckDB oracle can mirror it exactly.
# --------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}


def _marker_count(text: str, words: list[str]) -> int:
    toks = text.lower().split()
    ws = set(words)
    return sum(1 for t in toks if t in ws)


def guess_lang(text: str | None) -> str | None:
    """Argmax over marker counts; deterministic tiebreak by language code;
    'und' when nothing matches."""
    if text is None:
        return None
    best_lang, best_n = "und", 0
    for lang in sorted(LANG_MARKERS):
        n = _marker_count(text, LANG_MARKERS[lang])
        if n > best_n:
            best_lang, best_n = lang, n
    return best_lang


def _guess_lang_series(text: pd.Series) -> pd.Series:
    return text.map(guess_lang, na_action="ignore").astype(object).where(text.notna(), None)


guess_lang_udf = _SessionScopedPandasUDF(_guess_lang_series, T.StringType())
