"""URL normalization for web-page keys — pure JVM expressions.

A Common-Crawl-style pipeline keys everything on urls (BASELINE.json
input_hint; the reference keys graph entities on curated ids —
workflow/scripts/graph_build/*), so canonicalizing them is a first-class
engine function: host/path split, path depth, tracking-parameter strip.

Everything here is built from ``parse_url`` + higher-order array
functions — whole-stage-codegen expressions, no UDF, no regex passes in
python. At 10^10 rows this runs at scan speed inside the same stage as
the surrounding projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters dropped by canonicalize (analytics/campaign noise
#: that fragments otherwise-identical page keys)
TRACKING_PREFIX = "utm_"


def url_host(url: Column) -> Column:
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def url_query(url: Column) -> Column:
    """Raw query string; NULL when the url has no ``?`` part."""
    return F.parse_url(url, F.lit("QUERY"))


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments, as a long."""
    segs = F.filter(F.split(url_path(url), "/"), lambda x: x != F.lit(""))
    return F.size(segs).cast("long")


def canonical_url(url: Column) -> Column:
    """host + path + query with ``utm_*`` tracking params stripped (query
    dropped entirely when nothing survives). Scheme/fragment dropped —
    the dedup-stable page identity a crawl pipeline keys on."""
    q = url_query(url)
    kept = F.filter(
        F.split(q, "&"), lambda p: ~p.startswith(TRACKING_PREFIX)
    )
    clean = F.array_join(kept, "&")
    return F.concat(
        url_host(url),
        url_path(url),
        F.when(q.isNotNull() & (clean != ""), F.concat(F.lit("?"), clean))
        .otherwise(F.lit("")),
    )


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append host / path / depth / canonical columns for ``url_col``."""
    u = F.col(url_col)
    return (
        df.withColumn("host", url_host(u))
        .withColumn("path", url_path(u))
        .withColumn("depth", path_depth(u))
        .withColumn("canonical", canonical_url(u))
    )
