"""REST-API source patterns (SURVEY.md §2.1 S4).

The reference harvests upstream APIs driver-side into pandas
(requests.get(...).json() -> pd.DataFrame — source/get_opengwas.py:20-45,
rels/gwas-gencor.py:32-43, incl. transposed dict-of-dicts and paged POST
loops). Two Spark-first shapes replace it:

- ``fetch_records``: small/paged feeds — fetch on the driver (the part
  that must be sequential anyway: auth, paging cursors), then
  ``createDataFrame``. Right when the API result is << cluster scale.
- ``fetch_partitioned``: many independent endpoints (one per id) — ship
  the id list as a DataFrame and fetch *inside* ``mapInPandas``, so
  thousands of calls spread across executors with bounded per-task
  concurrency. Right for fan-out harvests like the reference's per-GWAS
  MELODI pulls (34-167 min single-host, source/get_gwas_melodi.py:128-129).

The HTTP call itself is injected (``fetcher``): tests use a deterministic
fake; production passes a requests/urllib closure. No network IO happens
in this module itself.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def fetch_records(
    spark: SparkSession,
    pages: Iterable[dict],
    *,
    schema: T.StructType | str,
    transpose: bool = False,
    transpose_id_col: str = "id",
) -> DataFrame:
    """Driver-side fetch -> DataFrame. ``pages`` is any iterable of JSON
    documents (the caller's paging loop, already authenticated).
    ``transpose=True`` handles the dict-of-dicts orientation the reference
    meets (pd.DataFrame(res).T — source/get_opengwas.py:26-27); the outer
    dict's keys (the record ids, which land in the pandas index after
    ``.T``) are preserved as ``transpose_id_col`` — createDataFrame drops
    the index, so they must be reset into a real column."""
    frames = []
    for doc in pages:
        if transpose:
            pdf = pd.DataFrame(doc).T
            pdf.index.name = transpose_id_col
            pdf = pdf.reset_index()
        else:
            pdf = pd.DataFrame(doc)
        frames.append(pdf)
    if not frames:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(pd.concat(frames, ignore_index=True), schema)


def fetch_partitioned(
    ids: DataFrame,
    fetcher: Callable[[object], list[dict]],
    *,
    schema: T.StructType | str,
    id_col: str = "id",
) -> DataFrame:
    """Executor-side fan-out: one ``fetcher(id) -> [records]`` call per id,
    run inside mapInPandas over the ids DataFrame. Repartition ``ids`` to
    control call concurrency (tasks = partitions); failures should be
    handled inside ``fetcher`` (return [] / tagged error records) so one
    bad endpoint doesn't fail a task of hundreds."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for v in pdf[id_col]:
                rows.extend(fetcher(v))
            if rows:
                yield pd.DataFrame(rows)

    return ids.mapInPandas(run, schema)
