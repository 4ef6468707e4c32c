"""Dataset profiling sink (reference K6 parity).

The reference shuffles a 100k-row sample into pandas-profiling HTML per
dataset (utils/writers.py:276-284, utils/pandas-profiling.sh:7-17). The
engine's version is a queryable metrics DataFrame instead of a report
file: per-column null counts, distinct estimates, min/max, computed in
ONE aggregation pass (all columns' aggregates in a single job — no
per-column scans), over an optional sample.

``approx_count_distinct`` (HyperLogLog++) keeps the distinct estimate a
streaming aggregate — exact distinct per column would be one shuffle per
column at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    *,
    sample_fraction: float | None = None,
    approx_distinct: bool = True,
) -> DataFrame:
    """One row per column: name, dtype, n_rows, n_null, n_distinct
    (approx by default), min/max (as strings — heterogeneous types).
    Single aggregation job regardless of column count."""
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=42)

    aggs = [F.count(F.lit(1)).alias("__n")]
    simple_types = {"string", "int", "bigint", "double", "float", "date",
                    "timestamp", "boolean", "decimal"}
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    for name, dt in cols:
        aggs.append(F.count(F.when(F.col(name).isNull(), 1)).alias(f"__null_{name}"))
        base = dt.split("(")[0]
        if base in simple_types:
            distinct = (
                F.approx_count_distinct(name) if approx_distinct
                else F.countDistinct(name)
            )
            aggs += [
                distinct.alias(f"__nd_{name}"),
                # min/max on the NATIVE type (numeric order), cast after
                F.min(name).cast("string").alias(f"__min_{name}"),
                F.max(name).cast("string").alias(f"__max_{name}"),
            ]
    row = df.agg(*aggs).first()

    out = []
    for name, dt in cols:
        base = dt.split("(")[0]
        out.append({
            "column": name,
            "dtype": dt,
            "n_rows": row["__n"],
            "n_null": row[f"__null_{name}"],
            "n_distinct": row[f"__nd_{name}"] if base in simple_types else None,
            "min": row[f"__min_{name}"] if base in simple_types else None,
            "max": row[f"__max_{name}"] if base in simple_types else None,
        })
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_null long, "
        "n_distinct long, min string, max string",
    )
