"""Text analytics as pure JVM column expressions (no Python in hot path).

Training-data pipeline functions over a documents corpus: token counting,
quality scoring, language-ID, rolling-hash fingerprints. Reference analog:
the per-record string transforms of SURVEY.md §2.10 (F1-F5) generalized to
corpus statistics. Everything returns ``Column``s composable in selects —
Catalyst keeps them inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (GPT-2-style contraction/word/number/symbol split, simplified to a
# portable character-class regex).
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = (
    "the of and to in a is that it for on as are with be this was at by an "
    "or from has have not but they you his her its were which"
).split()


def ws_token_count(text) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, r"\s+"))


def bpe_token_count(text) -> Column:
    """BPE-ish token count via regexp_extract_all (a cheap proxy for
    tokenizer-cost estimation at corpus scale)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), F.lit(0)))


def punct_ratio(text) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords —
    high ratio correlates with natural prose, low with boilerplate/noise."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = F.split(F.lower(text), r"\s+")
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.greatest(F.size(toks), F.lit(1))


def quality_score(text, *, min_chars: int = 100, min_tokens: int = 20) -> Column:
    """Composite 0..1 quality gate score: length gate * prose signals.
    Deterministic, threshold-friendly; mirrors common web-corpus filters
    (length, symbol density, stopword presence)."""
    length_ok = (F.length(text) >= min_chars) & (ws_token_count(text) >= min_tokens)
    prose = (
        F.lit(1.0)
        - F.least(punct_ratio(text) * 2, F.lit(0.5))
        + F.least(stopword_ratio(text), F.lit(0.5))
    ) / 1.5
    return F.when(length_ok, F.round(prose, 6)).otherwise(F.lit(0.0))


def rolling_fingerprints(text, *, window: int = 8, keep_mod: int = 16) -> Column:
    """Winnowing-style document fingerprints: xxhash64 over each sliding
    window of ``window`` tokens, keeping hashes ≡ 0 (mod ``keep_mod``) —
    a deterministic ~1/keep_mod sample usable for containment detection
    (shared fingerprints => shared passages). Returns array<long>."""
    toks = F.split(text, r"\s+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - window, F.lit(0)))
    window_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, window), " "))
    )
    return F.array_distinct(
        F.filter(window_hashes, lambda h: F.pmod(h, F.lit(keep_mod)) == 0)
    )
