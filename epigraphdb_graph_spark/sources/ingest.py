"""Dataset-ingest lifecycle: read -> conform -> validate -> sink.

The Spark re-expression of the reference's per-dataset entry point
(SURVEY.md §3.2): ``setup() -> script.process() -> create_import()``
(utils/general.py:73-99, utils/writers.py:217-289). The 67 per-dataset
scripts collapse into one declarative registry of ``Dataset`` specs —
reader + transform + contract — because the engine's operators cover
their whole transform vocabulary.

What the reference does imperatively, mapped:

- get_meta_data registry row (general.py:102-133)  -> ``Dataset`` dataclass
- df_check QC (qc.py:86-99)                        -> schema.check_contract
- inject ``_source`` provenance (writers.py:229-231) -> real array column
- inject ``_id``/``_name`` denormalized copies (writers.py:233-253)
                                                   -> ``id_prop``/``name_prop``
- gzip CSV + header + import fragment (writers.py:271-274)
                                                   -> parquet/LakeTable sink
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TableContract, check_contract


@dataclass
class Dataset:
    """One registry entry (analog of a data_integration.yaml row:
    name, source files, processing script, provenance string)."""

    meta_id: str
    source: str                                     # provenance label
    reader: Callable[[SparkSession], DataFrame]     # scan stage
    transform: Callable[[DataFrame], DataFrame] | None = None
    contract: TableContract | None = None
    id_prop: str | None = None
    name_prop: str | None = None


def ingest(spark: SparkSession, ds: Dataset, *, check_unique: bool = True) -> DataFrame:
    """Run one dataset through the lifecycle; returns the conformed frame
    ready for a sink (LakeTable.merge / overwrite or parquet write)."""
    df = ds.reader(spark)
    if ds.transform is not None:
        df = ds.transform(df)
    if ds.contract is not None:
        df = check_contract(df, ds.contract, check_unique=check_unique)
    # system columns (writers.py:229-253): _source provenance array,
    # _id/_name denormalized copies of the declared id/name properties
    df = df.withColumn("_source", F.array(F.lit(ds.source)))
    if ds.id_prop:
        df = df.withColumn("_id", F.col(ds.id_prop).cast("string"))
    if ds.name_prop:
        df = df.withColumn("_name", F.col(ds.name_prop).cast("string"))
    return df


def ingest_all(
    spark: SparkSession,
    datasets: list[Dataset],
    key: str,
    *,
    check_unique: bool = True,
) -> DataFrame:
    """Ingest a registry of datasets that share one contract key and
    consolidate them per key (the reference's merge_sources stage —
    operators/consolidate.py does the heavy lifting)."""
    from ..operators.consolidate import consolidate_sources

    frames = [
        (ds.source, ingest(spark, ds, check_unique=check_unique).drop("_source"))
        for ds in datasets
    ]
    return consolidate_sources(frames, key=key)
